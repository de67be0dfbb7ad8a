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
    """Read a .mtx file into a CSR matrix (dense array files included)."""
    m = sio.mmread(path)
    if not sp.issparse(m):
        m = sp.csr_matrix(m)
    return m.tocsr()


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
