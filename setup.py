"""Build script: metadata lives in pyproject.toml; this file only adds the
optional native extension (host-side IO parsing + Hungarian assignment,
native/progx_native.cpp). The package works without it — the Python
wrappers in progressivex_tpu.io fall back transparently — so build
failures of the extension must not fail the install."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install because the optional extension won't build."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001
            print(f"[progressivex-tpu] skipping native extension: {e}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"[progressivex-tpu] skipping {ext.name}: {e}")


setup(
    ext_modules=[
        Extension(
            "progx_native",
            sources=["native/progx_native.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
