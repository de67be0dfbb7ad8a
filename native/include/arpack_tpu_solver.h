/* arpack_tpu_solver.h — full-solver C ABI (the ICB Xsaupd_c/Xseupd_c
 * analog, ICB/arpack.h:10-21): lets C/C++/Fortran hosts run the TPU
 * eigensolver on concrete matrices, in all four scalar types s/d/c/z,
 * with stat/debug control (stat_c.h:12-16, debug_c.h:6-9 analogs) and
 * checkpoint dump/restart (arpackSolver.hpp:153-154 analog).
 * Implementation embeds CPython (native/src/capi.cc); link against
 * libarpack_tpu_capi.so and a matching libpython.
 *
 * Reverse-communication granularity: per-matvec reverse communication
 * inside the hot loop is deliberately not reproduced, but the
 * CAPABILITY — any caller-supplied operator (SRC/dsaupd.f:68-97) — is:
 * the atpu_*_matvec_* entries take a C function pointer computing
 * y = A*x plus an opaque context.  Each call crosses device->host->C
 * and back (exactly the reference's RCI data path, and exactly as
 * serializing); the solve runs on the hybrid host-reduced-space driver
 * on the CPU backend by default.  For TPU-speed solves pass the matrix
 * (or use the Python API with a traced operator).
 *
 * Conventions:
 *  - dense matrices row-major, n*n scalars; CSR uses 64-bit
 *    indptr/indices; complex buffers are interleaved (re,im) pairs —
 *    bit-compatible with C99 float/double _Complex and C++ std::complex.
 *  - `which` is the two-character reference selector (LM/SM/LA/SA/BE/
 *    LR/SR/LI/SI).
 *  - `has_sigma` != 0 enables shift-invert about sigma.
 *  - `schur` != 0 returns Schur basis vectors instead of Ritz vectors
 *    (dneupd howmny='P'; non-symmetric entry points only).
 *  - eigenvectors: vector j occupies elements [j*n, (j+1)*n).
 *  - returns 0 on success or a reference-style info code (<0 error,
 *    1 = maxiter); `nconv` receives the converged count and may exceed
 *    nev by one for non-symmetric conjugate pairs (dneupd semantics).
 *  - generalized problems: pass the dense mass matrix `m` (NULL = I).
 */
#ifndef ARPACK_TPU_SOLVER_H
#define ARPACK_TPU_SOLVER_H

#include "arpack_tpu.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ---- matrix-free (user-operator) entries -------------------------------
 * The reference's defining C capability (ICB/arpack.h:10-21 + the ido
 * loop, SRC/dsaupd.f:68-97) as a function-pointer matvec: fn computes
 * y = A*x for a length-n vector (x is read-only; ctx is passed through
 * verbatim).  Documented SLOW path: one host round trip per matvec. */

typedef void (*atpu_matvec_d)(atpu_int n, const double *x, double *y,
                              void *ctx);
typedef void (*atpu_matvec_s)(atpu_int n, const float *x, float *y,
                              void *ctx);

atpu_int atpu_eigsh_matvec_d(atpu_int n, atpu_matvec_d op, void *ctx,
                             atpu_int nev, const char *which, double tol,
                             atpu_int ncv, atpu_int max_iter,
                             double *evals, double *evecs,
                             atpu_int *nconv);

atpu_int atpu_eigsh_matvec_s(atpu_int n, atpu_matvec_s op, void *ctx,
                             atpu_int nev, const char *which, double tol,
                             atpu_int ncv, atpu_int max_iter,
                             float *evals, float *evecs, atpu_int *nconv);

atpu_int atpu_eigs_matvec_d(atpu_int n, atpu_matvec_d op, void *ctx,
                            atpu_int nev, const char *which, double tol,
                            atpu_int ncv, atpu_int max_iter,
                            double *evals_re, double *evals_im,
                            double *evecs_re, double *evecs_im,
                            atpu_int *nconv);

atpu_int atpu_eigs_matvec_s(atpu_int n, atpu_matvec_s op, void *ctx,
                            atpu_int nev, const char *which, double tol,
                            atpu_int ncv, atpu_int max_iter,
                            float *evals_re, float *evals_im,
                            float *evecs_re, float *evecs_im,
                            atpu_int *nconv);

/* ---- symmetric real ---------------------------------------------------- */

atpu_int atpu_eigsh_dense_d(atpu_int n, const double *a, const double *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, double *evals,
                            double *evecs, atpu_int *nconv);

atpu_int atpu_eigsh_dense_s(atpu_int n, const float *a, const float *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, float *evals,
                            float *evecs, atpu_int *nconv);

atpu_int atpu_eigsh_csr_d(atpu_int n, const atpu_int *indptr,
                          const atpu_int *indices, const double *data,
                          atpu_int nnz, atpu_int nev, const char *which,
                          double tol, atpu_int ncv, atpu_int max_iter,
                          double *evals, double *evecs, atpu_int *nconv);

atpu_int atpu_eigsh_csr_s(atpu_int n, const atpu_int *indptr,
                          const atpu_int *indices, const float *data,
                          atpu_int nnz, atpu_int nev, const char *which,
                          double tol, atpu_int ncv, atpu_int max_iter,
                          float *evals, float *evecs, atpu_int *nconv);

/* ---- non-symmetric real (split re/im outputs, dneupd packed-pair
 *      convention flattened into two parallel arrays) ------------------- */

atpu_int atpu_eigs_dense_d(atpu_int n, const double *a, const double *m,
                           atpu_int nev, const char *which, double sigma,
                           int has_sigma, double tol, atpu_int ncv,
                           atpu_int max_iter, int schur, double *evals_re,
                           double *evals_im, double *evecs_re,
                           double *evecs_im, atpu_int *nconv);

atpu_int atpu_eigs_dense_s(atpu_int n, const float *a, const float *m,
                           atpu_int nev, const char *which, double sigma,
                           int has_sigma, double tol, atpu_int ncv,
                           atpu_int max_iter, int schur, float *evals_re,
                           float *evals_im, float *evecs_re,
                           float *evecs_im, atpu_int *nconv);

atpu_int atpu_eigs_csr_d(atpu_int n, const atpu_int *indptr,
                         const atpu_int *indices, const double *data,
                         atpu_int nnz, atpu_int nev, const char *which,
                         double tol, atpu_int ncv, atpu_int max_iter,
                         int schur, double *evals_re, double *evals_im,
                         double *evecs_re, double *evecs_im,
                         atpu_int *nconv);

/* ---- complex (interleaved buffers; a/m/evals/evecs hold 2x scalars) ----- */

atpu_int atpu_eigs_dense_z(atpu_int n, const double *a, const double *m,
                           atpu_int nev, const char *which,
                           double sigma_re, double sigma_im, int has_sigma,
                           double tol, atpu_int ncv, atpu_int max_iter,
                           int schur, double *evals, double *evecs,
                           atpu_int *nconv);

atpu_int atpu_eigs_dense_c(atpu_int n, const float *a, const float *m,
                           atpu_int nev, const char *which,
                           double sigma_re, double sigma_im, int has_sigma,
                           double tol, atpu_int ncv, atpu_int max_iter,
                           int schur, float *evals, float *evecs,
                           atpu_int *nconv);

atpu_int atpu_eigs_csr_z(atpu_int n, const atpu_int *indptr,
                         const atpu_int *indices, const double *data,
                         atpu_int nnz, atpu_int nev, const char *which,
                         double tol, atpu_int ncv, atpu_int max_iter,
                         int schur, double *evals, double *evecs,
                         atpu_int *nconv);

/* ---- distributed entry points (the ICB/parpack.h analog) -----------------
 * The reference's parallel ICB threads an explicit MPI communicator
 * through every driver (ICB/parpack.h:10-39, icbpdn.F90:3-13:
 * `pdnaupd_c(MPI_Fint comm, ...)`).  The TPU-native communicator is a
 * device mesh; these `atpu_p*` variants take its size as the FIRST
 * argument, mirroring the comm-first convention:
 *   n_devices = 1  -> single-device (same as the unprefixed entry)
 *   n_devices = 0  -> the whole visible device set (MPI_COMM_WORLD analog)
 *   n_devices = k  -> first k visible devices (MPI_Comm_split analog, the
 *                     issue46 sub-communicator pattern)
 * The solve is row-partitioned over the mesh with replicated NCV-space,
 * exactly the PARPACK data distribution (SRC/dsaupd.f:331-348).
 * atpu_device_count() reports the visible device count (the
 * MPI_Comm_size analog).  Requesting more devices than visible fails
 * with -9998 (the untestable-ambient-default failure the explicit
 * argument exists to prevent). */

atpu_int atpu_device_count(void);

atpu_int atpu_peigsh_dense_d(atpu_int n_devices, atpu_int n,
                             const double *a, const double *m,
                             atpu_int nev, const char *which, double sigma,
                             int has_sigma, double tol, atpu_int ncv,
                             atpu_int max_iter, double *evals,
                             double *evecs, atpu_int *nconv);

atpu_int atpu_peigsh_dense_s(atpu_int n_devices, atpu_int n,
                             const float *a, const float *m,
                             atpu_int nev, const char *which, double sigma,
                             int has_sigma, double tol, atpu_int ncv,
                             atpu_int max_iter, float *evals,
                             float *evecs, atpu_int *nconv);

atpu_int atpu_peigsh_csr_d(atpu_int n_devices, atpu_int n,
                           const atpu_int *indptr, const atpu_int *indices,
                           const double *data, atpu_int nnz, atpu_int nev,
                           const char *which, double tol, atpu_int ncv,
                           atpu_int max_iter, double *evals, double *evecs,
                           atpu_int *nconv);

atpu_int atpu_peigsh_csr_s(atpu_int n_devices, atpu_int n,
                           const atpu_int *indptr, const atpu_int *indices,
                           const float *data, atpu_int nnz, atpu_int nev,
                           const char *which, double tol, atpu_int ncv,
                           atpu_int max_iter, float *evals, float *evecs,
                           atpu_int *nconv);

atpu_int atpu_peigs_dense_d(atpu_int n_devices, atpu_int n,
                            const double *a, const double *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, int schur, double *evals_re,
                            double *evals_im, double *evecs_re,
                            double *evecs_im, atpu_int *nconv);

atpu_int atpu_peigs_dense_s(atpu_int n_devices, atpu_int n,
                            const float *a, const float *m,
                            atpu_int nev, const char *which, double sigma,
                            int has_sigma, double tol, atpu_int ncv,
                            atpu_int max_iter, int schur, float *evals_re,
                            float *evals_im, float *evecs_re,
                            float *evecs_im, atpu_int *nconv);

atpu_int atpu_peigs_csr_d(atpu_int n_devices, atpu_int n,
                          const atpu_int *indptr, const atpu_int *indices,
                          const double *data, atpu_int nnz, atpu_int nev,
                          const char *which, double tol, atpu_int ncv,
                          atpu_int max_iter, int schur, double *evals_re,
                          double *evals_im, double *evecs_re,
                          double *evecs_im, atpu_int *nconv);

atpu_int atpu_peigs_dense_z(atpu_int n_devices, atpu_int n,
                            const double *a, const double *m,
                            atpu_int nev, const char *which,
                            double sigma_re, double sigma_im, int has_sigma,
                            double tol, atpu_int ncv, atpu_int max_iter,
                            int schur, double *evals, double *evecs,
                            atpu_int *nconv);

atpu_int atpu_peigs_dense_c(atpu_int n_devices, atpu_int n,
                            const float *a, const float *m,
                            atpu_int nev, const char *which,
                            double sigma_re, double sigma_im, int has_sigma,
                            double tol, atpu_int ncv, atpu_int max_iter,
                            int schur, float *evals, float *evecs,
                            atpu_int *nconv);

atpu_int atpu_peigs_csr_z(atpu_int n_devices, atpu_int n,
                          const atpu_int *indptr, const atpu_int *indices,
                          const double *data, atpu_int nnz, atpu_int nev,
                          const char *which, double tol, atpu_int ncv,
                          atpu_int max_iter, int schur, double *evals,
                          double *evecs, atpu_int *nconv);

/* ---- stat/debug control -------------------------------------------------
 * atpu_stat_c mirrors stat_c() (ICB/stat_c.h:12-16): 5 op counters + 26
 * per-phase timer slots.  The dtype-parametric engine fills the slot
 * family (ts, tn or tc) matching the LAST solve; others read 0 — same
 * observable behavior as the reference, where only the family you ran is
 * nonzero.  atpu_debug_c mirrors debug_c() (ICB/debug_c.h:6-9) with the
 * dtype families collapsed (one level per routine, applies to all
 * dtypes).  atpu_stats_reset mirrors sstats_c/sstatn_c/cstatn_c. */

void atpu_stats_reset(void);

void atpu_stat_c(atpu_int *nopx, atpu_int *nbx, atpu_int *nrorth,
                 atpu_int *nitref, atpu_int *nrstrt, float *tsaupd,
                 float *tsaup2, float *tsaitr, float *tseigt,
                 float *tsgets, float *tsapps, float *tsconv,
                 float *tnaupd, float *tnaup2, float *tnaitr,
                 float *tneigh, float *tngets, float *tnapps,
                 float *tnconv, float *tcaupd, float *tcaup2,
                 float *tcaitr, float *tceigh, float *tcgets,
                 float *tcapps, float *tcconv, float *tmvopx,
                 float *tmvbx, float *tgetv0, float *titref,
                 float *trvec);

void atpu_debug_c(atpu_int logfil, atpu_int ndigit, atpu_int mgetv0,
                  atpu_int maupd, atpu_int maup2, atpu_int maitr,
                  atpu_int meigt, atpu_int mapps, atpu_int mgets,
                  atpu_int meupd);

/* ---- matrix-market reader + residual verifier ----------------------------
 * The arpackSolver convenience surface, C-reachable: createMatrix's
 * MatrixMarket ingestion (arpackSolver.hpp:176-215) and checkEigVec's
 * independent residual verification (arpackSolver.hpp:297-323).
 *
 * Reader protocol (two calls): atpu_mm_query probes sizes (symmetric
 * storage is expanded — nnz is the EXPANDED CSR count the read call
 * delivers), then atpu_mm_read_{d,z} fills caller-allocated CSR buffers
 * (indptr: n_rows+1, indices/data: nnz; _z data interleaved re,im).
 * Returns 0, or -1 on read/parse failure.
 *
 * Verifier: max_i ||A v_i - lambda_i B v_i|| / (|lambda_i| ||v_i||) over
 * nconv pairs; *max_res receives it; returns 0 if <= diff_tol, 1 if
 * above, -1 on error.  `dense` != 0: a/m are row-major n*n and the
 * indptr/indices arguments are ignored (pass NULL).  m == NULL: B = I.
 * The _d variant takes dneupd-convention split re/im values/vectors
 * (NULL imag parts = real spectrum); _z takes interleaved complex. */

atpu_int atpu_mm_query(const char *path, atpu_int *n_rows,
                       atpu_int *n_cols, atpu_int *nnz, int *is_complex);

atpu_int atpu_mm_read_d(const char *path, atpu_int *indptr,
                        atpu_int *indices, double *data);

atpu_int atpu_mm_read_z(const char *path, atpu_int *indptr,
                        atpu_int *indices, double *data);

atpu_int atpu_check_eigvec_d(atpu_int n, int dense,
                             const atpu_int *indptr,
                             const atpu_int *indices, const double *a,
                             atpu_int nnz, const atpu_int *m_indptr,
                             const atpu_int *m_indices, const double *m,
                             atpu_int m_nnz, atpu_int nconv,
                             const double *evals_re,
                             const double *evals_im,
                             const double *evecs_re,
                             const double *evecs_im, double diff_tol,
                             double *max_res);

atpu_int atpu_check_eigvec_z(atpu_int n, int dense,
                             const atpu_int *indptr,
                             const atpu_int *indices, const double *a,
                             atpu_int nnz, const atpu_int *m_indptr,
                             const atpu_int *m_indices, const double *m,
                             atpu_int m_nnz, atpu_int nconv,
                             const double *evals, const double *evecs,
                             double diff_tol, double *max_res);

/* ---- checkpoint dump/restart --------------------------------------------
 * Applies to the NEXT solve call, then clears (the reference's restart is
 * likewise per-solve: info!=0 + caller resid, SRC/dsaupd.f:130-136).
 * Pass NULL to clear either path.  Returns 0, or -1 on an unescapable
 * path. */
/* howmny='S' select mask (ICB/arpack.hpp:44-48 ritz_specified — the
 * reference documents it but its Fortran core returns info=-12; here it
 * is implemented).  Applies to the NEXT solve: mask[i] != 0 selects the
 * i-th Ritz value of the final factorization (positional, converged
 * entries only; lengths beyond ncv are ignored).  NULL/0 clears. */
atpu_int atpu_set_select(const atpu_int *mask, atpu_int len);

atpu_int atpu_set_checkpoint(const char *dump_path,
                             const char *restart_path);

#ifdef __cplusplus
}
#endif

#endif /* ARPACK_TPU_SOLVER_H */
