// Native reduced-space kernels: symmetric tridiagonal eigensolver with
// last-component tracking (dstqrb equivalent) and implicit-shift Givens
// bulge chase with accumulated Q (dsapps equivalent).
//
// Algorithms: implicit QL iteration with Wilkinson shifts for the
// tridiagonal eigenproblem (the classical imtql2/tql2 scheme, written
// from the standard mathematical description), tracking either only the
// last row of the accumulated rotation product (stqrb) or the full
// matrix (steqr); and the standard implicit single-shift symmetric QR
// bulge chase for exact-shift application with the reference's deflation
// semantics (SRC/dsapps.f:226-443).

#include "arpack_tpu.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

template <typename T>
T hypot2(T a, T b) {
  return std::hypot(a, b);
}

// Implicit-QL tridiagonal eigensolver.  RowTrack: if true, track only the
// last row of the eigenvector matrix in z[n]; else accumulate the full
// eigenvector matrix in z (row-major n*n, initialized to identity by
// caller convention handled here).
template <typename T, bool FullZ>
atpu_int tridiag_ql(atpu_int n, T *d, T *e_in, T *z) {
  if (n == 0) return 0;
  std::vector<T> e(n);
  for (atpu_int i = 0; i + 1 < n; ++i) e[i] = e_in[i];
  e[n - 1] = T(0);

  if (FullZ) {
    std::memset(z, 0, sizeof(T) * size_t(n) * size_t(n));
    for (atpu_int i = 0; i < n; ++i) z[i * n + i] = T(1);
  } else {
    for (atpu_int i = 0; i < n; ++i) z[i] = T(0);
    z[n - 1] = T(1);
  }

  const T eps = std::numeric_limits<T>::epsilon();
  for (atpu_int l = 0; l < n; ++l) {
    int iter = 0;
    atpu_int m;
    do {
      for (m = l; m + 1 < n; ++m) {
        T dd = std::abs(d[m]) + std::abs(d[m + 1]);
        if (std::abs(e[m]) <= eps * dd) break;
      }
      if (m != l) {
        if (iter++ == 50) return l + 1;  // failed to converge
        T g = (d[l + 1] - d[l]) / (2 * e[l]);
        T r = hypot2(g, T(1));
        g = d[m] - d[l] + e[l] / (g + std::copysign(r, g));
        T s = 1, c = 1, p = 0;
        atpu_int i;
        for (i = m - 1; i >= l; --i) {
          T f = s * e[i];
          T b = c * e[i];
          r = hypot2(f, g);
          e[i + 1] = r;
          if (r == T(0)) {
            d[i + 1] -= p;
            e[m] = T(0);
            break;
          }
          s = f / r;
          c = g / r;
          g = d[i + 1] - p;
          r = (d[i] - g) * s + 2 * c * b;
          p = s * r;
          d[i + 1] = g + p;
          g = c * r - b;
          // rotate the eigenvector accumulation: columns i, i+1
          if (FullZ) {
            for (atpu_int k = 0; k < n; ++k) {
              T fk = z[k * n + i + 1];
              z[k * n + i + 1] = s * z[k * n + i] + c * fk;
              z[k * n + i] = c * z[k * n + i] - s * fk;
            }
          } else {
            T fk = z[i + 1];
            z[i + 1] = s * z[i] + c * fk;
            z[i] = c * z[i] - s * fk;
          }
        }
        if (r == T(0) && i >= l) continue;
        d[l] -= p;
        e[l] = g;
        e[m] = T(0);
      }
    } while (m != l);
  }

  // ascending sort with z permuted
  std::vector<atpu_int> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](atpu_int a, atpu_int b) { return d[a] < d[b]; });
  std::vector<T> dtmp(n);
  for (atpu_int i = 0; i < n; ++i) dtmp[i] = d[idx[i]];
  std::copy(dtmp.begin(), dtmp.end(), d);
  if (FullZ) {
    std::vector<T> row(n);
    for (atpu_int k = 0; k < n; ++k) {
      for (atpu_int i = 0; i < n; ++i) row[i] = z[k * n + idx[i]];
      std::copy(row.begin(), row.end(), z + k * n);
    }
  } else {
    std::vector<T> ztmp(n);
    for (atpu_int i = 0; i < n; ++i) ztmp[i] = z[idx[i]];
    std::copy(ztmp.begin(), ztmp.end(), z);
  }
  return 0;
}

// One implicit-shift symmetric QR bulge chase over the block
// [istart, iend] (inclusive), shift mu, accumulating rotations into the
// row-major q (n x n): q <- q * G for every Givens G; T <- G^T T G with
// G[i,i]=c, G[i,i+1]=-s, G[i+1,i]=s, G[i+1,i+1]=c.
template <typename T>
void chase_block(atpu_int n, T *d, T *e, T *q, atpu_int istart,
                 atpu_int iend, T mu) {
  if (istart >= iend) return;
  T x = d[istart] - mu;   // vector being annihilated: (x, z)
  T zb = e[istart];
  for (atpu_int i = istart; i < iend; ++i) {
    T r = hypot2(x, zb);
    T c, s;
    if (r == T(0)) {
      c = T(1);
      s = T(0);
      r = T(0);
    } else {
      c = x / r;
      s = zb / r;
    }
    if (i > istart) e[i - 1] = r;  // bulge from the previous step dies here
    // G^T T G on the (i, i+1) block of the tridiagonal profile
    T di = d[i], di1 = d[i + 1], ei = e[i];
    d[i] = c * c * di + 2 * c * s * ei + s * s * di1;
    d[i + 1] = s * s * di - 2 * c * s * ei + c * c * di1;
    e[i] = c * s * (di1 - di) + (c * c - s * s) * ei;
    T bulge = T(0);
    if (i < iend - 1) {
      bulge = s * e[i + 1];        // new bulge at (i, i+2)
      e[i + 1] = c * e[i + 1];
    }
    // accumulate q <- q G (columns i, i+1)
    for (atpu_int k = 0; k < n; ++k) {
      T qa = q[k * n + i], qb = q[k * n + i + 1];
      q[k * n + i] = c * qa + s * qb;
      q[k * n + i + 1] = -s * qa + c * qb;
    }
    x = e[i];
    zb = bulge;
  }
}

}  // namespace

extern "C" {

const char *atpu_version(void) { return "arpack_tpu_native 0.1.0"; }

atpu_int atpu_stqrb_d(atpu_int n, double *d, double *e, double *z) {
  return tridiag_ql<double, false>(n, d, e, z);
}

atpu_int atpu_stqrb_s(atpu_int n, float *d, float *e, float *z) {
  return tridiag_ql<float, false>(n, d, e, z);
}

atpu_int atpu_steqr_d(atpu_int n, double *d, double *e, double *s) {
  return tridiag_ql<double, true>(n, d, e, s);
}

atpu_int atpu_sym_shift_q_d(atpu_int n, double *d, double *e, atpu_int np,
                            const double *shifts, double *q) {
  // q := identity
  std::memset(q, 0, sizeof(double) * size_t(n) * size_t(n));
  for (atpu_int i = 0; i < n; ++i) q[i * n + i] = 1.0;
  const double eps = std::numeric_limits<double>::epsilon();

  for (atpu_int jj = 0; jj < np; ++jj) {
    double mu = shifts[jj];
    // chase the shift through every deflated block (dsapps block loop)
    atpu_int istart = 0;
    while (istart < n) {
      atpu_int iend = istart;
      while (iend + 1 < n && e[iend] != 0.0) ++iend;
      chase_block<double>(n, d, e, q, istart, iend, mu);
      istart = iend + 1;
    }
    // deflation sweep after each shift
    for (atpu_int i = 0; i + 1 < n; ++i) {
      double big = std::abs(d[i]) + std::abs(d[i + 1]);
      if (std::abs(e[i]) <= eps * big) e[i] = 0.0;
    }
  }
  // non-negative subdiagonal via diagonal similarity (dsapps.f:396-402)
  double phi = 1.0;
  std::vector<double> phis(n);
  phis[0] = 1.0;
  for (atpu_int i = 0; i + 1 < n; ++i) {
    double s = (e[i] >= 0.0) ? 1.0 : -1.0;
    phi *= s;
    phis[i + 1] = phi;
    e[i] = std::abs(e[i]);
  }
  for (atpu_int k = 0; k < n; ++k)
    for (atpu_int i = 0; i < n; ++i) q[k * n + i] *= phis[i];
  return 0;
}

}  // extern "C"
