"""Full-dataset code-path tests without network access.

The AdelaideRMF harness normally downloads adelaideH/adelaideF zips
(`eval/adelaide.download_adelaide`, mirroring the reference
`dataset_comparison/utils.py:29-49`). Offline CI can't reach the server,
so these tests serve a locally built zip of the bundled scenes through a
monkeypatched urlopen and drive the download -> unzip -> discover -> load
pipeline end to end — proving the full-dataset path works before it ever
meets the real 19+18-scene datasets.
"""

import io
import os
import zipfile

import numpy as np
import pytest

from progressivex_tpu.eval import adelaide
from progressivex_tpu.io.data import (
    ADELAIDE_H_SCENES,
    DEFAULT_ROOT,
    load_corr_scene,
)


class _FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def read(self):
        return self._payload

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture()
def fake_adelaide_server(monkeypatch):
    """Serve adelaideH.zip (built from the bundled scenes) via urlopen."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for scene in ADELAIDE_H_SCENES:
            src = os.path.join(DEFAULT_ROOT, scene, f"{scene}.txt")
            zf.write(src, f"adelaideH/{scene}/{scene}.txt")
    payload = buf.getvalue()
    calls = []

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        if "adelaideH.zip" not in url:
            raise OSError(f"unexpected URL {url}")
        return _FakeResponse(payload)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return calls


def test_download_unzip_discover_load(tmp_path, fake_adelaide_server):
    ddir = adelaide.download_adelaide("H", dest=str(tmp_path))
    assert ddir is not None and os.path.isdir(ddir)
    assert fake_adelaide_server, "urlopen was never called"
    # Zip removed after extraction; scene dirs in place.
    assert not os.path.exists(os.path.join(str(tmp_path), "adelaideH.zip"))

    scene_root, names, full = adelaide.discover_scenes("H", root=ddir)
    assert full, "an extracted dataset directory must count as full"
    assert sorted(names) == sorted(ADELAIDE_H_SCENES)

    corrs, gt = load_corr_scene(names[0], root=scene_root)
    ref_corrs, ref_gt = load_corr_scene(names[0], root=DEFAULT_ROOT)
    np.testing.assert_array_equal(corrs, ref_corrs)
    np.testing.assert_array_equal(gt, ref_gt)


def test_download_cache_hit_skips_network(tmp_path, fake_adelaide_server):
    first = adelaide.download_adelaide("H", dest=str(tmp_path))
    n_calls = len(fake_adelaide_server)
    second = adelaide.download_adelaide("H", dest=str(tmp_path))
    assert first == second
    assert len(fake_adelaide_server) == n_calls, "cache hit re-downloaded"


def test_download_failure_falls_back(tmp_path, monkeypatch, capsys):
    import urllib.request

    def boom(url, timeout=None):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    monkeypatch.setattr(adelaide, "CACHE_DIR", str(tmp_path / "cache"))
    ddir = adelaide.download_adelaide("H", dest=str(tmp_path / "cache"))
    assert ddir is None
    scene_root, names, full = adelaide.discover_scenes("H")
    assert not full
    assert sorted(names) == sorted(ADELAIDE_H_SCENES)
    assert os.path.isdir(scene_root)


def test_vendored_data_is_default_root():
    """The repo must be self-contained: the resolved data root should not
    require the reference checkout when the vendored data/ dir exists."""
    repo_data = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
    )
    if os.path.isdir(repo_data) and not os.environ.get("PROGX_DATA_ROOT"):
        assert DEFAULT_ROOT == repo_data
    for scene in ADELAIDE_H_SCENES:
        corrs, gt = load_corr_scene(scene)
        assert corrs.shape[0] == gt.shape[0] and corrs.shape[1] == 4
