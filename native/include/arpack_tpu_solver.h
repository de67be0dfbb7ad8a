/* arpack_tpu_solver.h — full-solver C ABI (the ICB dsaupd_c/dseupd_c
 * analog): lets C/C++/Fortran hosts run the TPU eigensolver on concrete
 * matrices.  Implementation embeds CPython (native/src/capi.cc); link
 * against libarpack_tpu_capi.so and a matching libpython.
 *
 * Reverse-communication granularity is deliberately not exposed: a host
 * callback per matvec would stall the TPU pipeline; pass the matrix (or
 * use the Python API with a traced operator).
 *
 * All matrices row-major; CSR uses 64-bit indptr/indices.  `which` is the
 * two-character reference selector.  `has_sigma` != 0 enables shift-invert
 * about `sigma`.  Returns 0 on success or a reference-style negative info
 * code; `nconv` receives the converged count and may exceed nev by one for
 * non-symmetric conjugate pairs (dneupd semantics).
 */
#ifndef ARPACK_TPU_SOLVER_H
#define ARPACK_TPU_SOLVER_H

#include "arpack_tpu.h"

#ifdef __cplusplus
extern "C" {
#endif

atpu_int atpu_eigsh_dense_d(atpu_int n, const double *a, const double *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, double *evals,
                            double *evecs, atpu_int *nconv);

atpu_int atpu_eigs_dense_d(atpu_int n, const double *a, const double *m,
                           atpu_int nev, const char *which, double sigma,
                           int has_sigma, double tol, atpu_int ncv,
                           atpu_int max_iter, double *evals_re,
                           double *evals_im, double *evecs_re,
                           double *evecs_im, atpu_int *nconv);

atpu_int atpu_eigsh_csr_d(atpu_int n, const atpu_int *indptr,
                          const atpu_int *indices, const double *data,
                          atpu_int nnz, atpu_int nev, const char *which,
                          double tol, atpu_int ncv, atpu_int max_iter,
                          double *evals, double *evecs, atpu_int *nconv);

#ifdef __cplusplus
}
#endif

#endif /* ARPACK_TPU_SOLVER_H */
