"""Sparse operators on device.

The reference's sparse story lives in user code (RCI matvecs) and in the
Eigen-based C++ layer (``EigSMxS`` sparse matrices read from MatrixMarket,
arpackSolver.hpp:176-215).  Here sparse matrices are first-class operators:

* :class:`ELLOperator` — sliced-ELLPACK layout (rows padded to a fixed
  per-row nnz budget): on TPU the gather of ``x[cols]`` vectorizes and the
  row reduction is a dense masked sum — the format of choice for
  bandwidth-bound SpMV on wide-SIMD hardware (cf. the SELL-C-sigma
  literature; PAPERS.md).  This is the default import path for scipy
  matrices.
* :func:`coo_matvec` — scatter-add fallback for extremely irregular
  matrices.

A Pallas block-sparse kernel (ops/pallas_spmv.py) supersedes these on the
hot path for large problems.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import pad_dim
from .operator import Operator


def _to_ell(a: sp.spmatrix, n_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Convert to ELLPACK (cols, vals) with per-row padding.

    Padded slots point at column ``n_pad-1`` with value 0 (the pad region is
    identically zero in every solver vector, so no masking is needed in the
    inner loop)."""
    csr = a.tocsr()
    n = csr.shape[0]
    nnz_per_row = np.diff(csr.indptr)
    width = int(nnz_per_row.max()) if n > 0 else 0
    width = max(width, 1)
    cols = np.full((n_pad, width), n_pad - 1, dtype=np.int32)
    vals = np.zeros((n_pad, width), dtype=csr.dtype)
    for i in range(n):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        k = hi - lo
        cols[i, :k] = csr.indices[lo:hi]
        vals[i, :k] = csr.data[lo:hi]
    return cols, vals


def ell_matvec(cols: jax.Array, vals: jax.Array, x: jax.Array) -> jax.Array:
    """y_i = sum_k vals[i,k] * x[cols[i,k]] — gather + dense reduction."""
    return jnp.sum(vals * x[cols], axis=1)


def coo_matvec(rows: jax.Array, cols: jax.Array, vals: jax.Array,
               x: jax.Array, n_out: int) -> jax.Array:
    """Scatter-add SpMV (fallback for pathological row distributions)."""
    return jnp.zeros((n_out,), x.dtype).at[rows].add(vals * x[cols])


def from_scipy(a: sp.spmatrix, dtype=None, *, hermitian: bool = False,
               n_pad: int = 0, format: str = "ell") -> Operator:
    """Import a scipy sparse matrix as a device operator (mode 1).

    The eventual analog of arpackSolver's ``createMatrix`` MatrixMarket
    ingestion (arpackSolver.hpp:176-215; use io/matrix_market.py to read
    ``.mtx`` files)."""
    a = a.tocsr()
    if dtype is not None:
        a = a.astype(dtype)
    n = a.shape[0]
    n_pad = n_pad or pad_dim(n)
    if format == "ell":
        cols_np, vals_np = _to_ell(a, n_pad)
        cols = jnp.asarray(cols_np)
        vals = jnp.asarray(vals_np)

        def matvec(x):
            return ell_matvec(cols, vals, x)
    elif format == "coo":
        coo = a.tocoo()
        rows = jnp.asarray(coo.row.astype(np.int32))
        ccols = jnp.asarray(coo.col.astype(np.int32))
        vals = jnp.asarray(coo.data)

        def matvec(x):
            return coo_matvec(rows, ccols, vals, x, n_pad)
    else:
        raise ValueError(f"unknown sparse format {format!r}")

    def apply(v, bv):
        w = matvec(v)
        return w, w

    return Operator(n=n, dtype=a.dtype, apply=apply, bmat="I", mode=1,
                    a_apply=matvec, n_pad=n_pad, hermitian=hermitian)
