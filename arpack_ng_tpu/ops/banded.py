"""Banded-matrix operators and convenience eigensolver drivers — the
EXAMPLES/BAND family ([sdcz][sn]band.f) rebuilt TPU-native.

The reference's ``dsband`` is a self-contained driver: it factors
``A - sigma*M`` with LAPACK ``dgbtrf``, applies OP with ``dgbtrs``/
``dgbmv``, and internally runs the whole RCI loop for modes 1-5
(EXAMPLES/BAND/dsband.f:30-52,399-463).  Here:

* the banded **matvec** runs on device as a diagonal-offset
  shift-and-multiply sweep (kl+ku+1 fused multiply-adds over length-n
  vectors — pure VPU streaming at HBM bandwidth, no gather);
* the banded **solve** for shift-invert modes is host-factored once
  (scipy LAPACK ``gbtrf``-equivalent) and applied on device as an
  explicit-inverse GEMM (MXU-optimal), or matrix-free via device
  CG/BiCGSTAB for very large n;
* :func:`eigsh_banded` / :func:`eigs_banded` reproduce the one-call
  "give me eigenvalues of this concrete banded matrix" API including all
  spectral-transform modes.

Banded storage follows LAPACK/scipy ``ab[kl+ku+1, n]`` convention:
``ab[ku + i - j, j] == a[i, j]``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import pad_dim
from .operator import Operator
from . import transforms


def _diagonals_from_ab(ab: np.ndarray, kl: int, ku: int, n: int):
    """Offsets and full-length diagonal arrays from LAPACK band storage."""
    offs, diags = [], []
    for d in range(-kl, ku + 1):
        row = ku - d
        diag = np.zeros(n, ab.dtype)
        if d >= 0:
            # a[i, i+d] = ab[ku - d, i + d] for i in 0..n-d-1
            diag[: n - d] = ab[row, d:n]
        else:
            diag[: n + d] = ab[row, : n + d]
        offs.append(d)
        diags.append(diag)
    return offs, diags


def banded_matvec_fn(ab: np.ndarray, kl: int, ku: int, n: int, n_pad: int):
    """Device closure computing y = A x for the banded A.

    y_i = sum_d diag_d[i or i+d] * x_{i+d}: each band contributes one
    shifted elementwise multiply — (kl+ku+1) streaming passes that XLA
    fuses into a single loop (the dgbmv analog, EXAMPLES/BAND/dsband.f
    matvec)."""
    offs, diags = _diagonals_from_ab(ab, kl, ku, n)
    dev_diags = [jnp.asarray(d) for d in diags]

    def matvec(x):
        xs = x[:n]
        y = jnp.zeros((n,), x.dtype)
        for d, diag in zip(offs, dev_diags):
            if d >= 0:
                # y[i] += a[i, i+d] * x[i+d]; diag[i] holds a[i, i+d]
                contrib = diag[: n - d] * xs[d:] if d > 0 else diag * xs
                y = y.at[: n - d].add(contrib) if d > 0 else y + contrib
            else:
                m = -d
                contrib = diag[: n - m] * xs[: n - m]
                y = y.at[m:].add(contrib)
        if n_pad == n:
            return y
        return jnp.zeros((n_pad,), x.dtype).at[:n].set(y)

    return matvec


def _ab_to_sparse(ab: np.ndarray, kl: int, ku: int, n: int) -> sp.spmatrix:
    offs, diags = _diagonals_from_ab(ab, kl, ku, n)
    mats = []
    for d, diag in zip(offs, diags):
        m = n - abs(d)
        mats.append(sp.diags(diag[:m] if d >= 0 else diag[:m], d,
                             shape=(n, n)))
    return sum(mats).tocsr()


def banded_operator(ab, kl: int, ku: int, *, dtype=None,
                    hermitian: bool = False, n_pad: int = 0) -> Operator:
    """Mode-1 operator from LAPACK band storage."""
    ab = np.asarray(ab)
    if dtype is not None:
        ab = ab.astype(dtype)
    n = ab.shape[1]
    n_pad = n_pad or pad_dim(n)
    mv = banded_matvec_fn(ab, kl, ku, n, n_pad)

    def apply(v, bv):
        w = mv(v)
        return w, w

    return Operator(n=n, dtype=ab.dtype, apply=apply, bmat="I", mode=1,
                    a_apply=mv, n_pad=n_pad, hermitian=hermitian)


def _banded_spectral_op(ab, mb, kl, ku, sigma, mode_num, sym, dtype):
    """Build the OP/B pair for banded modes 2-5 (dsband types 2-6)."""
    ab = np.asarray(ab)
    if dtype is not None:
        ab = ab.astype(dtype)
    n = ab.shape[1]
    n_pad = pad_dim(n)
    a_sp = _ab_to_sparse(ab, kl, ku, n)
    a_mv = banded_matvec_fn(ab, kl, ku, n, n_pad)
    if mb is not None:
        mb = np.asarray(mb).astype(ab.dtype)
        m_sp = _ab_to_sparse(mb, kl, ku, n)
        m_mv = banded_matvec_fn(mb, kl, ku, n, n_pad)
    else:
        m_sp = None
        m_mv = None

    if sigma is None and mb is None:
        return banded_operator(ab, kl, ku, hermitian=sym)
    if sigma is None:
        # mode 2: OP = inv(M) A — factor M (banded) on host
        builder = transforms.build_sym_operator if sym \
            else transforms.build_nonsym_operator
        return builder(a_sp, M=m_sp, sigma=None, dtype=ab.dtype)

    # shift-invert family: factor (A - sigma M) once on host (the dgbtrf
    # step of dsband.f:463), apply on device as explicit-inverse GEMM
    builder = transforms.build_sym_operator if sym \
        else transforms.build_nonsym_operator
    mode_name = {3: "normal", 4: "buckling", 5: "cayley"}[mode_num]
    if sym:
        return transforms.build_sym_operator(
            a_sp, M=m_sp, sigma=sigma, mode=mode_name, dtype=ab.dtype)
    return transforms.build_nonsym_operator(
        a_sp, M=m_sp, sigma=sigma, dtype=ab.dtype)


def eigsh_banded(ab, kl: int, ku: int, k: int = 6, *, mb=None,
                 sigma: Optional[float] = None, mode: str = "normal",
                 which: str = "LM", ncv: Optional[int] = None,
                 tol: float = 0.0, maxiter: int = 500, dtype=None,
                 return_eigenvectors: bool = True, seed: int = 0):
    """dsband/ssband equivalent: symmetric banded eigensolver, modes 1-5."""
    from .. import api
    mode_num = {"normal": 3, "buckling": 4, "cayley": 5}[mode]
    op = _banded_spectral_op(ab, mb, kl, ku, sigma, mode_num, True, dtype)
    return api.eigsh(op, k=k, which=which, ncv=ncv, tol=tol,
                     maxiter=maxiter, seed=seed,
                     return_eigenvectors=return_eigenvectors)


def eigs_banded(ab, kl: int, ku: int, k: int = 6, *, mb=None,
                sigma: Optional[complex] = None, which: str = "LM",
                ncv: Optional[int] = None, tol: float = 0.0,
                maxiter: int = 500, dtype=None,
                return_eigenvectors: bool = True, seed: int = 0):
    """dnband/znband equivalent: non-symmetric/complex banded solver."""
    from .. import api
    op = _banded_spectral_op(ab, mb, kl, ku, sigma, 3, False, dtype)
    return api.eigs(op, k=k, which=which, ncv=ncv, tol=tol,
                    maxiter=maxiter, seed=seed,
                    return_eigenvectors=return_eigenvectors)
