/* C-ABI smoke test: the icb_arpack_c.c analog (TESTS/icb_arpack_c.c:
 * 1000x1000 diagonal matrix diag(1..1000), largest eigenvalues, checks
 * values and convergence count). */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "arpack_tpu_solver.h"

int main(void) {
  const atpu_int n = 200;       /* diag(1..n), dense for the C surface */
  const atpu_int nev = 4;
  double *a = calloc((size_t)(n * n), sizeof(double));
  for (atpu_int i = 0; i < n; ++i) a[i * n + i] = (double)(i + 1);

  double evals[16] = {0};
  double *evecs = malloc(sizeof(double) * (size_t)n * 8);
  atpu_int nconv = 0;
  atpu_int rc = atpu_eigsh_dense_d(n, a, NULL, nev, "LM", 0.0, 0, 1e-10,
                                   20, 500, evals, evecs, &nconv);
  if (rc != 0) {
    fprintf(stderr, "FAIL: rc=%lld\n", (long long)rc);
    return 1;
  }
  if (nconv < nev) {
    fprintf(stderr, "FAIL: nconv=%lld\n", (long long)nconv);
    return 1;
  }
  for (atpu_int i = 0; i < nev; ++i) {
    double expect = (double)(n - nev + 1 + i);
    if (fabs(evals[i] - expect) > 1e-6) {
      fprintf(stderr, "FAIL: evals[%lld]=%f expect %f\n", (long long)i,
              evals[i], expect);
      return 1;
    }
  }
  printf("C-ABI OK: nconv=%lld evals=[%g %g %g %g]\n", (long long)nconv,
         evals[0], evals[1], evals[2], evals[3]);
  free(a);
  free(evecs);
  return 0;
}
