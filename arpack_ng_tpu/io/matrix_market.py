"""MatrixMarket I/O — the ingestion path of the reference's C++ solver
layer (``arpackSolver::createMatrix`` reading ``.mtx`` coordinate files,
EXAMPLES/MATRIX_MARKET/arpackSolver.hpp:176-215,361) and of the only
matrix-file-driven Fortran test (TESTS/dnsimp.f + TESTS/mmio.f reading
TESTS/testA.mtx).

Reading delegates to scipy.io (same format family: coordinate/array,
real/complex/integer/pattern, general/symmetric/skew-symmetric/hermitian);
:func:`load_operator` turns a file directly into a device operator.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

from ..ops.operator import Operator, from_dense
from ..ops.sparse import from_scipy


def read_matrix(path) -> sp.spmatrix:
    """Read a .mtx file into a CSR matrix (dense array files included).

    Standard MatrixMarket goes through scipy; the reference's shipped
    matrices (EXAMPLES/MATRIX_MARKET/A*.mtx etc.) are NOT standard — a
    spaced banner, optionally 0-based indices, optional nnz, complex
    values as ``(re, im)`` pairs, both triangles listed explicitly — so
    on a scipy parse failure this falls back to the lenient rules of the
    reference's own reader (arpackSolver.hpp:360-414): skip %%/blank
    lines, first data line ``n m [nnz]``, body ``i j value``, 1-based
    detected by ``max(index) == n`` and shifted down."""
    try:
        m = sio.mmread(path)
    except ValueError:
        return _read_lenient(path)
    if not sp.issparse(m):
        m = sp.csr_matrix(m)
    return m.tocsr()


def _read_lenient(path) -> sp.spmatrix:
    import re
    n = m = None
    rows, cols, vals = [], [], []
    cplx_re = re.compile(r"\(\s*([^,\s]+)\s*,\s*([^)\s]+)\s*\)")
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            if n is None:
                parts = line.split()
                n, m = int(parts[0]), int(parts[1])
                continue
            cm = cplx_re.search(line)
            if cm:
                ij = line[: cm.start()].split()
                rows.append(int(ij[0]))
                cols.append(int(ij[1]))
                vals.append(complex(float(cm.group(1)),
                                    float(cm.group(2))))
            else:
                i, j, v = line.split()
                rows.append(int(i))
                cols.append(int(j))
                vals.append(float(v))
    if n is None:
        raise ValueError(f"{path}: no size header found")
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    dtype = (np.complex128 if any(isinstance(v, complex) for v in vals)
             else np.float64)
    data = np.asarray(vals, dtype)
    if len(rows) and (rows.max() == n or cols.max() == m):
        rows -= 1                       # 1-based (reference detection rule)
        cols -= 1
    return sp.csr_matrix((data, (rows, cols)), shape=(n, m))


def write_matrix(path, a) -> None:
    sio.mmwrite(path, sp.coo_matrix(a))


def load_operator(path, *, dtype=None, dense: bool = False,
                  hermitian: Optional[bool] = None) -> Operator:
    """File -> operator (arpackmm's --A / --dense flags,
    EXAMPLES/MATRIX_MARKET/arpackmm.cpp:104-150)."""
    a = read_matrix(path)
    if hermitian is None:
        # detect symmetry the way arpackSolver trusts the mtx header:
        # cheap structural check on the assembled matrix
        d = (a - a.getH()).tocoo() if np.iscomplexobj(a.data) \
            else (a - a.T).tocoo()
        hermitian = (len(d.data) == 0 or
                     np.max(np.abs(d.data)) <= 1e-12 *
                     max(1.0, np.max(np.abs(a.data))))
    if dense:
        arr = a.toarray()
        if dtype is not None:
            arr = arr.astype(dtype)
        return from_dense(arr, hermitian=bool(hermitian))
    return from_scipy(a, dtype=dtype, hermitian=bool(hermitian))
