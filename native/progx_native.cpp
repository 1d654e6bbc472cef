// progx_native — native IO / metrics runtime for progressivex_tpu.
//
// The TPU compute path is JAX/XLA; this extension covers the host-side
// runtime pieces the reference implements natively: the AdelaideRMF-style
// ground-truth scene parser (reference `progx_utils.h:32-96` + the
// notebook loader `dataset_comparison/utils.py:15-27`) and the
// misclassification metric's optimal label assignment (the reference
// brute-forces label permutations, `utils.py:51-66` /
// `progx_utils.h:98-274`; here the Hungarian algorithm, exact with no
// class-count cap).
//
// Deliberately numpy-header-free: functions exchange raw little-endian
// buffers via Python bytes, and the thin Python wrappers in
// progressivex_tpu.io do the np.frombuffer reshapes. CPython C API only
// (no pybind11 in the build environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Parse an AdelaideRMF-style labeled correspondence file: rows of
//   x1 y1 1 x2 y2 1 label
// Returns (bytes corrs_f32[N*4], bytes labels_i32[N]).
PyObject* load_corr_scene(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = std::fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  std::vector<float> corrs;
  std::vector<int32_t> labels;
  corrs.reserve(4096);
  double x1, y1, h1, x2, y2, h2, lab;
  while (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf",
                     &x1, &y1, &h1, &x2, &y2, &h2, &lab) == 7) {
    corrs.push_back(static_cast<float>(x1));
    corrs.push_back(static_cast<float>(y1));
    corrs.push_back(static_cast<float>(x2));
    corrs.push_back(static_cast<float>(y2));
    labels.push_back(static_cast<int32_t>(lab));
  }
  std::fclose(f);
  if (labels.empty()) {
    PyErr_Format(PyExc_ValueError, "no 7-column rows parsed from %s", path);
    return nullptr;
  }
  PyObject* c = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(corrs.data()),
      static_cast<Py_ssize_t>(corrs.size() * sizeof(float)));
  PyObject* l = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(labels.data()),
      static_cast<Py_ssize_t>(labels.size() * sizeof(int32_t)));
  if (!c || !l) {
    Py_XDECREF(c);
    Py_XDECREF(l);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(2, c, l);
  Py_DECREF(c);
  Py_DECREF(l);
  return out;
}

// Hungarian algorithm (Jonker-style shortest augmenting path with
// potentials, O(n^3)) MAXIMIZING the assignment sum of an n x n int64
// matrix passed as raw bytes. Returns the maximal sum as a Python int.
PyObject* hungarian_max(PyObject*, PyObject* args) {
  Py_buffer buf;
  Py_ssize_t n_ss;
  if (!PyArg_ParseTuple(args, "y*n", &buf, &n_ss)) return nullptr;
  const int n = static_cast<int>(n_ss);
  if (buf.len != static_cast<Py_ssize_t>(sizeof(int64_t)) * n * n) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "matrix buffer size mismatch");
    return nullptr;
  }
  const int64_t* M = static_cast<const int64_t*>(buf.buf);

  // Minimize cost = -M with the classical potentials formulation
  // (1-indexed arrays, row-by-row augmentation).
  const double INF = 1e18;
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = -static_cast<double>(M[(i0 - 1) * n + (j - 1)])
                     - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  int64_t total = 0;
  for (int j = 1; j <= n; ++j) {
    if (p[j] > 0) total += M[(p[j] - 1) * n + (j - 1)];
  }
  PyBuffer_Release(&buf);
  return PyLong_FromLongLong(static_cast<long long>(total));
}

PyMethodDef kMethods[] = {
    {"load_corr_scene", load_corr_scene, METH_VARARGS,
     "Parse an AdelaideRMF-style labeled scene file -> (corrs_f32_bytes, "
     "labels_i32_bytes)."},
    {"hungarian_max", hungarian_max, METH_VARARGS,
     "Maximal assignment sum of an n x n int64 matrix (raw bytes, n)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "progx_native",
    "Native IO/metrics runtime for progressivex_tpu.", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_progx_native(void) { return PyModule_Create(&kModule); }
