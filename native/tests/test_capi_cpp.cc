// C++ typed-enum header test: the icb_arpack_cpp.cpp analog
// (TESTS/icb_arpack_cpp.cpp) — drives the overloaded wrappers of
// arpack_tpu.hpp over double, float and std::complex<double>.
#include <cmath>
#include <complex>
#include <cstdio>
#include <vector>

#include "arpack_tpu.hpp"

static int failures = 0;
#define CHECK(cond, msg)                                        \
  do {                                                          \
    if (!(cond)) {                                              \
      std::fprintf(stderr, "FAIL: %s\n", msg);                  \
      ++failures;                                               \
    }                                                           \
  } while (0)

int main() {
  using namespace arpack_tpu;
  const atpu_int n = 150, nev = 3;

  {                                           // double, symmetric
    std::vector<double> a(n * n, 0.0);
    for (atpu_int i = 0; i < n; ++i) a[i * n + i] = double(i + 1);
    std::vector<double> evals(nev + 2), evecs(n * (nev + 2));
    atpu_int nconv = 0;
    options o;
    o.w = which::largest_magnitude;
    o.tol = 1e-10;
    o.ncv = 16;
    o.max_iter = 500;
    CHECK(eigsh(n, a.data(), nullptr, nev, evals.data(), evecs.data(),
                &nconv, o) == 0, "eigsh<double> rc");
    CHECK(nconv >= nev, "eigsh<double> nconv");
    CHECK(std::abs(evals[nev - 1] - double(n)) < 1e-6,
          "eigsh<double> top value");
  }

  {                                           // howmny::ritz_specified
    std::vector<double> a(n * n, 0.0);
    for (atpu_int i = 0; i < n; ++i) a[i * n + i] = double(i + 1);
    std::vector<double> evals(nev + 2), evecs(n * (nev + 2));
    atpu_int nconv = 0;
    std::vector<atpu_int> mask(16, 0);
    mask[0] = 1; mask[1] = 1;  // Ritz #0 and #1 of the exit ordering
    options o;
    o.w = which::largest_algebraic;
    o.tol = 1e-10;
    o.ncv = 16;
    o.max_iter = 500;
    o.vectors = howmny::ritz_specified;
    o.select = mask.data();
    o.select_len = atpu_int(mask.size());
    CHECK(eigsh(n, a.data(), nullptr, nev, evals.data(), evecs.data(),
                &nconv, o) == 0, "ritz_specified rc");
    CHECK(nconv == 2, "ritz_specified count");
    CHECK(evals[0] > double(n - nev) && evals[1] > double(n - nev),
          "ritz_specified values from wanted set");
  }

  {                                           // float overload resolves
    std::vector<float> a(n * n, 0.0f);
    for (atpu_int i = 0; i < n; ++i) a[i * n + i] = float(i + 1);
    std::vector<float> evals(nev + 2), evecs(n * (nev + 2));
    atpu_int nconv = 0;
    options o;
    o.tol = 1e-4;
    o.ncv = 16;
    o.max_iter = 500;
    CHECK(eigsh(n, a.data(), nullptr, nev, evals.data(), evecs.data(),
                &nconv, o) == 0, "eigsh<float> rc");
    CHECK(nconv >= nev, "eigsh<float> nconv");
  }

  {                                           // complex<double> overload
    std::vector<std::complex<double>> a(n * n);
    for (atpu_int i = 0; i < n; ++i) {
      a[i * n + i] = {double(i + 1), 0.0};
      if (i + 1 < n) a[i * n + i + 1] = {0.0, 0.1};
    }
    std::vector<std::complex<double>> evals(nev + 2),
        evecs(n * (nev + 2));
    atpu_int nconv = 0;
    options o;
    o.tol = 1e-8;
    o.ncv = 16;
    o.max_iter = 500;
    CHECK(eigs(n, a.data(), nullptr, nev, evals.data(), evecs.data(),
               &nconv, o) == 0, "eigs<complex> rc");
    CHECK(nconv >= nev, "eigs<complex> nconv");
    CHECK(std::abs(evals[0].real() - double(n)) < 1e-4,
          "eigs<complex> top value");
  }

  {                                           // Schur-vector option enum
    std::vector<double> a(n * n, 0.0);
    for (atpu_int i = 0; i < n; ++i) {
      a[i * n + i] = double(i + 1);
      if (i + 1 < n) a[i * n + i + 1] = 0.3;
    }
    std::vector<double> vr(nev + 2), vi(nev + 2), zr(n * (nev + 2)),
        zi(n * (nev + 2));
    atpu_int nconv = 0;
    options o;
    o.tol = 1e-8;
    o.ncv = 20;
    o.max_iter = 500;
    o.vectors = howmny::schur_vectors;
    CHECK(eigs(n, a.data(), nullptr, nev, vr.data(), vi.data(),
               zr.data(), zi.data(), &nconv, o) == 0,
          "eigs schur rc");
    CHECK(nconv >= nev, "eigs schur nconv");
  }

  {                                           // parpack.hpp-analog overload
    if (device_count() >= 2) {
      std::vector<double> a(n * n, 0.0);
      for (atpu_int i = 0; i < n; ++i) a[i * n + i] = double(i + 1);
      std::vector<double> evals(nev + 2), evecs(n * (nev + 2));
      atpu_int nconv = 0;
      options o;
      o.w = which::largest_magnitude;
      o.tol = 1e-10;
      o.ncv = 16;
      o.max_iter = 500;
      CHECK(eigsh(atpu_int(2), n, a.data(), nullptr, nev, evals.data(),
                  evecs.data(), &nconv, o) == 0, "p eigsh rc");
      CHECK(nconv >= nev, "p eigsh nconv");
      CHECK(std::abs(evals[nev - 1] - double(n)) < 1e-8,
            "p eigsh top value");
    } else {
      std::printf("SKIP parallel overload (single device)\n");
    }
  }

  if (failures) {
    std::fprintf(stderr, "C++ header: %d failures\n", failures);
    return 1;
  }
  std::printf("C++ typed-enum header OK\n");
  return 0;
}
