// Full-solver C ABI: the ICB (dsaupd_c/dseupd_c) analog for the TPU
// framework.  The reference exposes its Fortran solvers to C through
// ISO_C_BINDING shims (ICB/arpack.h, SRC/icbads.F90); here the solver
// core is Python/JAX, so the C ABI embeds a CPython interpreter and
// drives the high-level API — the standard deployment route for
// compiled hosts (C/C++/Fortran applications) calling a JAX solver.
//
// Granularity note: the reference's RCI-level C interface (caller-supplied
// matvec via the ido loop) is intentionally NOT reproduced — a host-side
// per-matvec callback would serialize the TPU pipeline (the same reason
// the Python API replaces reverse communication with traced operators).
// The C surface therefore covers the concrete-matrix entry points:
// dense, CSR-sparse, and file-based problems.

#include "arpack_tpu_solver.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <dlfcn.h>

#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

std::mutex g_mu;
bool g_inited = false;

// Locate the arpack_ng_tpu package relative to this shared library
// (native/build/lib*.so -> repo root two levels up), plus any paths from
// $ARPACK_TPU_PATH, and put them on sys.path of the embedded interpreter.
void add_package_paths() {
  std::string code =
      "import sys, os\n"
      "for _p in os.environ.get('ARPACK_TPU_PATH', '').split(':'):\n"
      "    if _p and _p not in sys.path:\n"
      "        sys.path.insert(0, _p)\n";
  Dl_info info;
  if (dladdr(reinterpret_cast<void *>(&add_package_paths), &info)
      && info.dli_fname) {
    std::string so(info.dli_fname);
    auto cut = so.find_last_of('/');
    if (cut != std::string::npos) {
      std::string dir = so.substr(0, cut);  // native/build
      code += "for _p in ['" + dir + "/../..', '" + dir + "']:\n"
              "    _p = os.path.abspath(_p)\n"
              "    if _p not in sys.path:\n"
              "        sys.path.insert(0, _p)\n";
    }
  }
  PyRun_SimpleString(code.c_str());
}

bool ensure_python() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    add_package_paths();
  } else if (!g_inited) {
    add_package_paths();
  }
  g_inited = true;
  return true;
}

// Run a solve through arpack_ng_tpu.api and copy results out.
// Returns 0 on success, <0 reference-style error codes.
atpu_int run_eigsh(const char *mode_json, atpu_int n, const double *dense_a,
                   const atpu_int *indptr, const atpu_int *indices,
                   const double *data, atpu_int nnz, const double *dense_m,
                   atpu_int nev, const char *which, double sigma,
                   int has_sigma, double tol, atpu_int ncv,
                   atpu_int max_iter, int symmetric, double *eval_re,
                   double *eval_im, double *evec_re, double *evec_im,
                   atpu_int *nconv_out) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!ensure_python()) return -9999;
  PyGILState_STATE gil = PyGILState_Ensure();
  atpu_int rc = 0;
  PyObject *globals = nullptr, *result = nullptr;
  do {
    globals = PyDict_New();
    PyDict_SetItemString(globals, "__builtins__", PyEval_GetBuiltins());

    // stage the matrix into python via memoryviews
    PyObject *np_mod = PyImport_ImportModule("numpy");
    if (!np_mod) { rc = -9999; break; }
    PyDict_SetItemString(globals, "np", np_mod);
    Py_DECREF(np_mod);

    PyObject *capsA = nullptr;
    if (dense_a != nullptr) {
      capsA = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(const_cast<double *>(dense_a)),
          sizeof(double) * size_t(n) * size_t(n), PyBUF_READ);
      PyDict_SetItemString(globals, "bufA", capsA);
      Py_XDECREF(capsA);
    } else {
      PyObject *bi = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(const_cast<atpu_int *>(indptr)),
          sizeof(atpu_int) * size_t(n + 1), PyBUF_READ);
      PyObject *bj = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(const_cast<atpu_int *>(indices)),
          sizeof(atpu_int) * size_t(nnz), PyBUF_READ);
      PyObject *bv = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(const_cast<double *>(data)),
          sizeof(double) * size_t(nnz), PyBUF_READ);
      PyDict_SetItemString(globals, "bufP", bi);
      PyDict_SetItemString(globals, "bufI", bj);
      PyDict_SetItemString(globals, "bufV", bv);
      Py_XDECREF(bi); Py_XDECREF(bj); Py_XDECREF(bv);
    }
    if (dense_m != nullptr) {
      PyObject *bm = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(const_cast<double *>(dense_m)),
          sizeof(double) * size_t(n) * size_t(n), PyBUF_READ);
      PyDict_SetItemString(globals, "bufM", bm);
      Py_XDECREF(bm);
    }

    char code[4096];
    std::snprintf(code, sizeof(code), R"PY(
import numpy as _np
import os as _os
import jax as _jax
_jax.config.update('jax_enable_x64', True)
_plat = _os.environ.get('JAX_PLATFORMS', '')
if _plat:
    # honor the env even though an embedding host may have triggered
    # backend registration before this code runs
    _jax.config.update('jax_platforms', _plat.split(',')[0])
n = %lld
if 'bufA' in globals():
    A = _np.frombuffer(bufA, dtype=_np.float64).reshape(n, n).copy()
else:
    import scipy.sparse as _sp
    _p = _np.frombuffer(bufP, dtype=_np.int64)
    _i = _np.frombuffer(bufI, dtype=_np.int64)
    _v = _np.frombuffer(bufV, dtype=_np.float64)
    A = _sp.csr_matrix((_v, _i.astype(_np.int32), _p.astype(_np.int32)),
                       shape=(n, n))
M = None
if 'bufM' in globals():
    M = _np.frombuffer(bufM, dtype=_np.float64).reshape(n, n).copy()
import arpack_ng_tpu as _at
_kw = dict(k=%lld, which=%s, tol=%.17g, maxiter=%lld)
if %lld > 0:
    _kw['ncv'] = %lld
if %d:
    _kw['sigma'] = %.17g
if M is not None:
    _kw['M'] = M
_fn = _at.eigsh if %d else _at.eigs
vals, vecs = _fn(A, **_kw)
vals = _np.atleast_1d(_np.asarray(vals))
vecs = _np.asarray(vecs)
out_nconv = int(vals.shape[0])
out_vr = _np.ascontiguousarray(vals.real, dtype=_np.float64)
out_vi = _np.ascontiguousarray(_np.imag(vals), dtype=_np.float64)
out_zr = _np.ascontiguousarray(vecs.real, dtype=_np.float64)
out_zi = _np.ascontiguousarray(_np.imag(vecs), dtype=_np.float64)
)PY",
        (long long)n, (long long)nev,
        (std::string("'") + which + "'").c_str(), tol,
        (long long)max_iter, (long long)ncv, (long long)ncv, has_sigma,
        sigma, symmetric);

    result = PyRun_String(code, Py_file_input, globals, globals);
    if (result == nullptr) {
      PyErr_Print();
      rc = -9999;
      break;
    }
    PyObject *nc = PyDict_GetItemString(globals, "out_nconv");
    long long nconv = PyLong_AsLongLong(nc);
    *nconv_out = nconv;
    auto copy_arr = [&](const char *name, double *dst, size_t count) {
      PyObject *obj = PyDict_GetItemString(globals, name);
      PyObject *mv = PyObject_CallMethod(obj, "tobytes", nullptr);
      char *buf; Py_ssize_t len;
      PyBytes_AsStringAndSize(mv, &buf, &len);
      std::memcpy(dst, buf, std::min(size_t(len), count * sizeof(double)));
      Py_DECREF(mv);
    };
    copy_arr("out_vr", eval_re, size_t(nconv));
    if (eval_im) copy_arr("out_vi", eval_im, size_t(nconv));
    if (evec_re) copy_arr("out_zr", evec_re, size_t(n) * size_t(nconv));
    if (evec_im) copy_arr("out_zi", evec_im, size_t(n) * size_t(nconv));
  } while (false);
  Py_XDECREF(result);
  Py_XDECREF(globals);
  PyGILState_Release(gil);
  return rc;
}

}  // namespace

extern "C" {

atpu_int atpu_eigsh_dense_d(atpu_int n, const double *a, const double *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, double *evals,
                            double *evecs, atpu_int *nconv) {
  return run_eigsh(nullptr, n, a, nullptr, nullptr, nullptr, 0, m, nev,
                   which, sigma, has_sigma, tol, ncv, max_iter, 1, evals,
                   nullptr, evecs, nullptr, nconv);
}

atpu_int atpu_eigs_dense_d(atpu_int n, const double *a, const double *m,
                           atpu_int nev, const char *which, double sigma,
                           int has_sigma, double tol, atpu_int ncv,
                           atpu_int max_iter, double *evals_re,
                           double *evals_im, double *evecs_re,
                           double *evecs_im, atpu_int *nconv) {
  return run_eigsh(nullptr, n, a, nullptr, nullptr, nullptr, 0, m, nev,
                   which, sigma, has_sigma, tol, ncv, max_iter, 0,
                   evals_re, evals_im, evecs_re, evecs_im, nconv);
}

atpu_int atpu_eigsh_csr_d(atpu_int n, const atpu_int *indptr,
                          const atpu_int *indices, const double *data,
                          atpu_int nnz, atpu_int nev, const char *which,
                          double tol, atpu_int ncv, atpu_int max_iter,
                          double *evals, double *evecs, atpu_int *nconv) {
  return run_eigsh(nullptr, n, nullptr, indptr, indices, data, nnz,
                   nullptr, nev, which, 0.0, 0, tol, ncv, max_iter, 1,
                   evals, nullptr, evecs, nullptr, nconv);
}

}  // extern "C"
