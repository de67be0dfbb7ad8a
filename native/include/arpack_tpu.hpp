/* arpack_tpu.hpp — typed-enum C++ convenience header: the ICB/arpack.hpp
 * analog (reference: enum class which/bmat/howmny at arpack.hpp:9-49 and
 * overloaded saupd/naupd/eupd templates).  Header-only; wraps the C ABI
 * of arpack_tpu_solver.h with scoped enums and overload resolution on the
 * scalar type, so C++ hosts get compile-time dtype/selector checking.
 */
#ifndef ARPACK_TPU_HPP
#define ARPACK_TPU_HPP

#include <complex>
#include <cstring>
#include <stdexcept>
#include <vector>

#include "arpack_tpu_solver.h"

namespace arpack_tpu {

/* The reference's selector enums, arpack.hpp:9-49. */
enum class which : int {
  largest_magnitude,          /* 'LM' */
  smallest_magnitude,         /* 'SM' */
  largest_algebraic,          /* 'LA' (symmetric) */
  smallest_algebraic,         /* 'SA' (symmetric) */
  both_ends,                  /* 'BE' (symmetric) */
  largest_real,               /* 'LR' (nonsym/complex) */
  smallest_real,              /* 'SR' */
  largest_imaginary,          /* 'LI' */
  smallest_imaginary          /* 'SI' */
};

enum class bmat : int {
  identity,                   /* standard problem,    B = I  ('I') */
  generalized                 /* generalized problem, B = M  ('G') */
};

enum class howmny : int {
  ritz_vectors,               /* 'A' */
  schur_vectors,              /* 'P' */
  ritz_specified              /* 'S' (select mask via options.select) */
};

inline const char *to_c(which w) {
  switch (w) {
    case which::largest_magnitude:  return "LM";
    case which::smallest_magnitude: return "SM";
    case which::largest_algebraic:  return "LA";
    case which::smallest_algebraic: return "SA";
    case which::both_ends:          return "BE";
    case which::largest_real:       return "LR";
    case which::smallest_real:      return "SR";
    case which::largest_imaginary:  return "LI";
    case which::smallest_imaginary: return "SI";
  }
  return "LM";
}

struct options {
  which w = which::largest_magnitude;
  double sigma_re = 0.0;
  double sigma_im = 0.0;
  bool shift_invert = false;
  double tol = 0.0;           /* 0 = machine eps (reference default) */
  atpu_int ncv = 0;           /* 0 = auto */
  atpu_int max_iter = 0;      /* 0 = auto */
  howmny vectors = howmny::ritz_vectors;
  /* howmny::ritz_specified: positional select mask over the final
   * factorization's Ritz values (ICB/arpack.hpp:44-48); nonzero =
   * selected, length = select_len (ncv-sized; extra entries ignored) */
  const atpu_int *select = nullptr;
  atpu_int select_len = 0;
};

/* Arm the howmny='S' mask for the next C call when requested. */
inline void apply_select(const options &o) {
  if (o.vectors == howmny::ritz_specified && o.select)
    atpu_set_select(o.select, o.select_len);
  else
    atpu_set_select(nullptr, 0);
}

/* ---- overloaded dense symmetric/Hermitian drivers ----------------------- */

inline atpu_int eigsh(atpu_int n, const double *a, const double *m,
                      atpu_int nev, double *evals, double *evecs,
                      atpu_int *nconv, const options &o = {}) {
  apply_select(o);
  return atpu_eigsh_dense_d(n, a, m, nev, to_c(o.w), o.sigma_re,
                            o.shift_invert ? 1 : 0, o.tol, o.ncv,
                            o.max_iter, evals, evecs, nconv);
}

inline atpu_int eigsh(atpu_int n, const float *a, const float *m,
                      atpu_int nev, float *evals, float *evecs,
                      atpu_int *nconv, const options &o = {}) {
  apply_select(o);
  return atpu_eigsh_dense_s(n, a, m, nev, to_c(o.w), o.sigma_re,
                            o.shift_invert ? 1 : 0, o.tol, o.ncv,
                            o.max_iter, evals, evecs, nconv);
}

/* ---- overloaded dense non-symmetric/complex drivers ---------------------
 * Real scalars: complex results come back as split re/im arrays.
 * Complex scalars: interleaved layout == std::complex memory layout. */

inline atpu_int eigs(atpu_int n, const double *a, const double *m,
                     atpu_int nev, double *evals_re, double *evals_im,
                     double *evecs_re, double *evecs_im, atpu_int *nconv,
                     const options &o = {}) {
  apply_select(o);
  return atpu_eigs_dense_d(
      n, a, m, nev, to_c(o.w), o.sigma_re, o.shift_invert ? 1 : 0, o.tol,
      o.ncv, o.max_iter, o.vectors == howmny::schur_vectors ? 1 : 0,
      evals_re, evals_im, evecs_re, evecs_im, nconv);
}

inline atpu_int eigs(atpu_int n, const float *a, const float *m,
                     atpu_int nev, float *evals_re, float *evals_im,
                     float *evecs_re, float *evecs_im, atpu_int *nconv,
                     const options &o = {}) {
  apply_select(o);
  return atpu_eigs_dense_s(
      n, a, m, nev, to_c(o.w), o.sigma_re, o.shift_invert ? 1 : 0, o.tol,
      o.ncv, o.max_iter, o.vectors == howmny::schur_vectors ? 1 : 0,
      evals_re, evals_im, evecs_re, evecs_im, nconv);
}

inline atpu_int eigs(atpu_int n, const std::complex<double> *a,
                     const std::complex<double> *m, atpu_int nev,
                     std::complex<double> *evals,
                     std::complex<double> *evecs, atpu_int *nconv,
                     const options &o = {}) {
  apply_select(o);
  return atpu_eigs_dense_z(
      n, reinterpret_cast<const double *>(a),
      reinterpret_cast<const double *>(m), nev, to_c(o.w), o.sigma_re,
      o.sigma_im, o.shift_invert ? 1 : 0, o.tol, o.ncv, o.max_iter,
      o.vectors == howmny::schur_vectors ? 1 : 0,
      reinterpret_cast<double *>(evals),
      reinterpret_cast<double *>(evecs), nconv);
}

inline atpu_int eigs(atpu_int n, const std::complex<float> *a,
                     const std::complex<float> *m, atpu_int nev,
                     std::complex<float> *evals,
                     std::complex<float> *evecs, atpu_int *nconv,
                     const options &o = {}) {
  apply_select(o);
  return atpu_eigs_dense_c(
      n, reinterpret_cast<const float *>(a),
      reinterpret_cast<const float *>(m), nev, to_c(o.w), o.sigma_re,
      o.sigma_im, o.shift_invert ? 1 : 0, o.tol, o.ncv, o.max_iter,
      o.vectors == howmny::schur_vectors ? 1 : 0,
      reinterpret_cast<float *>(evals),
      reinterpret_cast<float *>(evecs), nconv);
}

/* ---- distributed overloads (the ICB/parpack.hpp analog) ------------------
 * Mesh size first, mirroring parpack's comm-first convention
 * (ICB/parpack.hpp / icbpdn.F90:3-13): 0 = whole visible device set,
 * k = first k devices.  device_count() is the MPI_Comm_size analog. */

inline atpu_int device_count() { return atpu_device_count(); }

inline atpu_int eigsh(atpu_int n_devices, atpu_int n, const double *a,
                      const double *m, atpu_int nev, double *evals,
                      double *evecs, atpu_int *nconv,
                      const options &o = {}) {
  apply_select(o);
  return atpu_peigsh_dense_d(n_devices, n, a, m, nev, to_c(o.w),
                             o.sigma_re, o.shift_invert ? 1 : 0, o.tol,
                             o.ncv, o.max_iter, evals, evecs, nconv);
}

inline atpu_int eigsh(atpu_int n_devices, atpu_int n, const float *a,
                      const float *m, atpu_int nev, float *evals,
                      float *evecs, atpu_int *nconv,
                      const options &o = {}) {
  apply_select(o);
  return atpu_peigsh_dense_s(n_devices, n, a, m, nev, to_c(o.w),
                             o.sigma_re, o.shift_invert ? 1 : 0, o.tol,
                             o.ncv, o.max_iter, evals, evecs, nconv);
}

inline atpu_int eigs(atpu_int n_devices, atpu_int n, const double *a,
                     const double *m, atpu_int nev, double *evals_re,
                     double *evals_im, double *evecs_re, double *evecs_im,
                     atpu_int *nconv, const options &o = {}) {
  apply_select(o);
  return atpu_peigs_dense_d(
      n_devices, n, a, m, nev, to_c(o.w), o.sigma_re,
      o.shift_invert ? 1 : 0, o.tol, o.ncv, o.max_iter,
      o.vectors == howmny::schur_vectors ? 1 : 0,
      evals_re, evals_im, evecs_re, evecs_im, nconv);
}

inline atpu_int eigs(atpu_int n_devices, atpu_int n,
                     const std::complex<double> *a,
                     const std::complex<double> *m, atpu_int nev,
                     std::complex<double> *evals,
                     std::complex<double> *evecs, atpu_int *nconv,
                     const options &o = {}) {
  apply_select(o);
  return atpu_peigs_dense_z(
      n_devices, n, reinterpret_cast<const double *>(a),
      reinterpret_cast<const double *>(m), nev, to_c(o.w), o.sigma_re,
      o.sigma_im, o.shift_invert ? 1 : 0, o.tol, o.ncv, o.max_iter,
      o.vectors == howmny::schur_vectors ? 1 : 0,
      reinterpret_cast<double *>(evals),
      reinterpret_cast<double *>(evecs), nconv);
}

}  // namespace arpack_tpu

#endif /* ARPACK_TPU_HPP */
