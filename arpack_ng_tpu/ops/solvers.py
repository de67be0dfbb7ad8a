"""Device-resident iterative linear solvers for matrix-free shift-invert.

The reference's C++ layer offers a mode-solver menu — direct (LU/QR/LLT/
LDLT) and iterative (CG/BiCG with diagonal or ILU preconditioning) — used
to apply ``inv(A - sigma*B)`` inside the RCI loop (arpackSolver.hpp
template parameter SLV; arpackmm.cpp:445-476 ``--slv CG|BiCG|LU|QR...``).

Here the iterative members run fully on device as jit-traceable
``lax.while_loop`` Krylov iterations (they are traced *inside* the
eigensolver's Arnoldi step, so an entire inner solve fuses into the outer
jitted cycle with zero host involvement):

* :func:`cg`        — conjugate gradients (SPD shifted systems)
* :func:`bicgstab`  — BiCGSTAB for non-symmetric systems (the reference
                      pairs BiCG with nonsym problems)
* diagonal (Jacobi) preconditioning, the reference's ``Diag`` option
  (:func:`jacobi_preconditioner`);
* ILU(0)-class preconditioning, the reference's ``ILU`` option
  (:func:`ilu0_preconditioner`): the factorization runs once on the host
  (SuperLU incomplete LU, natural ordering, zero fill) and the two
  triangular solves are replaced on device by **fixed-sweep truncated
  Neumann series** over the DIA-form strict triangles — pure streaming
  multiplies, no gather, no sequential substitution, jit-traceable inside
  the fused eigensolver loop.  K sweeps reproduce the exact triangular
  solve to K-th order in the strictly-triangular part; as a
  *preconditioner* (not a solve) this approximation only shifts the Krylov
  iteration count, never correctness.

Direct dense solves are in ops/transforms.py (host-factored explicit
inverse applied as a device GEMM); banded direct solves in ops/banded.py
(block cyclic reduction).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _vdot(a, b):
    return jnp.vdot(a, b)


def cg(matvec: Callable, b: jax.Array, *, x0=None, tol: float = 1e-8,
       maxiter: int = 1000, precond: Optional[Callable] = None) -> jax.Array:
    """Jit-traceable conjugate gradients: solves ``matvec(x) = b``."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r) if precond is not None else r
    p = z
    rz = _vdot(r, z)
    bnorm = jnp.sqrt(jnp.abs(_vdot(b, b)))
    atol2 = (tol * bnorm) ** 2

    def cond(c):
        x, r, z, p, rz, it = c
        return (jnp.abs(_vdot(r, r)) > atol2) & (it < maxiter)

    def body(c):
        x, r, z, p, rz, it = c
        ap = matvec(p)
        alpha = rz / _vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r) if precond is not None else r
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, *_ = lax.while_loop(cond, body, (x, r, z, p, rz, jnp.int32(0)))
    return x


def bicgstab(matvec: Callable, b: jax.Array, *, x0=None, tol: float = 1e-8,
             maxiter: int = 1000,
             precond: Optional[Callable] = None) -> jax.Array:
    """Jit-traceable BiCGSTAB for general (non-symmetric) systems."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    rho = alpha = omega = jnp.ones((), b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.sqrt(jnp.abs(_vdot(b, b)))
    atol2 = (tol * bnorm) ** 2

    def cond(c):
        x, r, rhat, rho, alpha, omega, v, p, it = c
        return (jnp.abs(_vdot(r, r)) > atol2) & (it < maxiter)

    def body(c):
        x, r, rhat, rho, alpha, omega, v, p, it = c
        rho_new = _vdot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = precond(p) if precond is not None else p
        v = matvec(ph)
        alpha = rho_new / _vdot(rhat, v)
        s = r - alpha * v
        sh = precond(s) if precond is not None else s
        t = matvec(sh)
        omega = _vdot(t, s) / _vdot(t, t)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        return (x, r, rhat, rho_new, alpha, omega, v, p, it + 1)

    x, *_ = lax.while_loop(
        cond, body, (x, r, rhat, rho, alpha, omega, v, p, jnp.int32(0)))
    return x


def jacobi_preconditioner(diag: jax.Array) -> Callable:
    """The reference's ``Diag`` preconditioner option (arpackmm ``--slv
    CG`` default dsIlu... menu, arpackmm.cpp:449-466)."""
    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
    inv = 1.0 / safe

    def precond(r):
        return inv * r

    return precond



def _padded_diag(a_sp, n_pad):
    import numpy as np
    d = np.asarray(a_sp.diagonal())
    if n_pad and n_pad > d.shape[0]:
        d = np.concatenate([d, np.ones(n_pad - d.shape[0], d.dtype)])
    return jnp.asarray(d)

def make_direct_inverse(mat, kind: str, *, pivot: float = 1e-6,
                        offset: float = 0.0, scale: float = 1.0,
                        n_pad: int = 0):
    """Host direct factorization -> explicit identity-padded inverse,
    to be applied on device as one GEMM (the TPU-idiomatic realization
    of a direct mode solver: the O(n^3) factor+invert runs once on the
    host, every application is an MXU matmul).

    The ``kind`` menu mirrors arpackSolver's Eigen direct solvers
    (arpackmm.cpp:445-463, arpackSolver.hpp:1030-1130):

    * ``LU``   — partial-pivoting LU (sparse inputs use SuperLU with
                 ``diag_pivot_thresh=pivot``, the setPivotThreshold analog,
                 arpackSolver.hpp:1055).
    * ``QR``   — column-pivoted Householder QR; ``pivot`` is the
                 rank-deficiency threshold on |diag(R)|
                 (ColPivHouseholderQR::setThreshold, arpackSolver.hpp:1110).
    * ``LLT``  — Cholesky, SPD matrices only (raises otherwise, like
                 Eigen::SimplicialLLT info() != Success).
    * ``LDLT`` — Bunch-Kaufman symmetric-indefinite LDL^T (LAPACK sysv,
                 the semidefinite-capable variant).

    ``offset``/``scale`` apply to the Cholesky-family factorizations as
    ``scale*S + offset*I`` (Eigen setShift semantics,
    arpackSolver.hpp:1071-1079)."""
    import numpy as np
    import scipy.linalg as sla
    import scipy.sparse as sp

    from .operator import _pad_mat_identity

    kind = kind.upper()
    is_sparse = sp.issparse(mat)
    n = mat.shape[0]
    n_pad = n_pad or n
    if kind in ("LLT", "LDLT") and (offset != 0.0 or scale != 1.0):
        eye = sp.eye(n, dtype=mat.dtype, format="csr") if is_sparse \
            else np.eye(n, dtype=mat.dtype)
        mat = scale * mat + offset * eye
    if kind == "LU" and is_sparse and n > 256:
        import scipy.sparse.linalg as spla
        a = sp.csc_matrix(mat)
        if np.issubdtype(a.dtype, np.floating) and a.dtype != np.float64:
            a = a.astype(np.float64)
        if np.issubdtype(a.dtype, np.complexfloating) \
                and a.dtype != np.complex128:
            a = a.astype(np.complex128)
        lu = spla.splu(a, diag_pivot_thresh=pivot)
        inv_n = lu.solve(np.eye(n, dtype=a.dtype)).astype(mat.dtype)
        inv = np.eye(n_pad, dtype=mat.dtype)
        inv[:n, :n] = inv_n
    else:
        m = _pad_mat_identity(mat.toarray() if is_sparse
                              else np.asarray(mat), n_pad)
        eye = np.eye(n_pad, dtype=m.dtype)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if kind == "LU":
                lu, piv = sla.lu_factor(m)
                inv = sla.lu_solve((lu, piv), eye)
            elif kind == "QR":
                q, r, p = sla.qr(m, pivoting=True)
                dr = np.abs(np.diag(r))
                if dr.min() <= pivot * max(dr.max(), 1e-300):
                    raise ValueError(
                        f"QR: matrix numerically rank-deficient at pivot "
                        f"threshold {pivot} (min|R_ii|/max|R_ii| = "
                        f"{dr.min() / dr.max():.2e})")
                x = sla.solve_triangular(r, q.conj().T, lower=False)
                inv = np.empty_like(x)
                inv[p, :] = x
            elif kind == "LLT":
                try:
                    c = sla.cho_factor(m, lower=True)
                except np.linalg.LinAlgError as e:
                    raise ValueError(
                        "LLT requires an SPD matrix (Cholesky failed: "
                        f"{e}); use LDLT or LU") from e
                inv = sla.cho_solve(c, eye)
            elif kind == "LDLT":
                herm = np.iscomplexobj(m)
                inv = sla.solve(m, eye, assume_a="her" if herm else "sym")
            else:
                raise ValueError(
                    f"unknown direct solver kind {kind!r}; expected "
                    "LU | QR | LLT | LDLT")
    if not np.all(np.isfinite(inv)):
        raise ValueError(
            f"{kind}: factored matrix is numerically singular (the shift "
            "appears to be an eigenvalue); perturb sigma")
    return inv


def ilu0_preconditioner(a_sp, *, sweeps: int = 3, dtype=None,
                        n_pad: int = 0, symmetric: bool = False,
                        drop_tol: float = 0.0,
                        fill_factor: float = 1.0) -> Callable:
    """ILU(0) preconditioner (arpackmm's ``ILU`` mode-solver option,
    arpackmm.cpp:445-476) with fully device-resident application.

    Host side (once): SuperLU incomplete LU with zero fill, natural column
    ordering and no row pivoting — the classic ILU(0) pattern.  Device
    side (per application): the two triangular solves are replaced by
    ``sweeps`` steps of the truncated Neumann series

        inv(L) r       ~= sum_k (-Ls)^k r          (L unit lower)
        inv(U) y       ~= sum_k (inv(D)(-Us))^k inv(D) y

    where ``Ls``/``Us`` are the strict triangles streamed in DIA form —
    no gathers (catastrophic on TPU, docs/PERF.md) and no O(n)-deep
    substitution chain.  The result is a fixed linear operator, exactly
    what Krylov preconditioning requires.

    ``symmetric=True`` builds the IC(0)-class SYMMETRIC form required by
    CG (a preconditioner for CG must be SPD; the plain two-triangle
    truncation is not):  ``M^-1 = p(L)^T D^-1 p(L)`` with ``p`` the same
    truncated Neumann polynomial — symmetric positive semidefinite by
    construction.  Measured on the 2-D Laplacian: the truncated
    application matches the EXACT triangular-solve ILU(0) one-application
    quality at sweeps=3-4 (0.444 vs 0.443 residual reduction), and
    BiCGSTAB reaches ~2.7x smaller residual per 20 iterations than
    Diag/none (docs/PERF.md).

    Falls back to Jacobi (with a warning) if SuperLU had to permute
    (structurally zero diagonal), since a device-side permutation would
    reintroduce gathers.
    """
    import warnings

    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from .sparse import _to_dia, dia_matvec_fn

    n = a_sp.shape[0]
    n_pad = n_pad or n
    A = sp.csc_matrix(a_sp)
    if dtype is not None:
        A = A.astype(dtype)
    if np.issubdtype(A.dtype, np.floating) and A.dtype != np.float64:
        A = A.astype(np.float64)          # SuperLU wants d/z
    try:
        # drop_tol/fill_factor expose the reference ILU#D#F knobs
        # (IncompleteLUT setDroptol/setFillfactor, arpackSolver.hpp:
        # 994-1006); the (0.0, 1.0) defaults give classic ILU(0)
        ilu = spla.spilu(A, drop_tol=drop_tol, fill_factor=fill_factor,
                         permc_spec="NATURAL", diag_pivot_thresh=0.0)
    except RuntimeError as e:             # singular ILU pivot
        warnings.warn(f"ILU(0) factorization failed ({e}); "
                      "falling back to Jacobi", stacklevel=2)
        return jacobi_preconditioner(_padded_diag(a_sp, n_pad))
    idperm = np.arange(n)
    if not (np.array_equal(ilu.perm_r, idperm)
            and np.array_equal(ilu.perm_c, idperm)):
        warnings.warn("ILU(0) required pivoting (zero structural "
                      "diagonal); falling back to Jacobi to stay "
                      "gather-free on device", stacklevel=2)
        return jacobi_preconditioner(_padded_diag(a_sp, n_pad))
    # Quality probe: ILU(0) of an INDEFINITE matrix can amplify rather
    # than precondition (measured: it sends an interior-shift BiCGSTAB
    # solve to garbage while Diag/None converge to 1e-12).  Reject a
    # factor whose exact application does not contract the residual.
    rng = np.random.default_rng(11)
    rp = rng.standard_normal(n)
    if np.iscomplexobj(A):
        rp = rp + 1j * rng.standard_normal(n)
    with np.errstate(all="ignore"):
        zp = ilu.solve(rp.astype(A.dtype))
        q = np.linalg.norm(rp - A @ zp) / np.linalg.norm(rp)
    if not np.isfinite(q) or q >= 1.0:
        warnings.warn(
            f"ILU(0) quality probe {q:.2f} >= 1 (indefinite/unstable "
            "incomplete factorization amplifies); falling back to Jacobi",
            stacklevel=2)
        return jacobi_preconditioner(_padded_diag(a_sp, n_pad))

    out_dtype = np.dtype(dtype) if dtype is not None else a_sp.dtype
    L = ilu.L.tocsr()
    U = ilu.U.tocsr()
    if drop_tol == 0.0 and fill_factor == 1.0:
        # classic ILU(0) keeps ONLY the pattern of A.  SuperLU's ILUTP
        # respects the memory cap but still scatters a little fill onto
        # off-pattern diagonals; at n=1M that fill materialized ~2000
        # distinct DIA offsets = gigabytes of device diagonals (measured
        # round 3: 8.6 GB of captured constants).  Masking to A's
        # pattern IS the ILU(0) definition and keeps the device form on
        # A's few diagonals.
        patt = sp.csr_matrix(
            (np.ones_like(a_sp.tocsr().data, dtype=np.float64),
             a_sp.tocsr().indices, a_sp.tocsr().indptr), shape=A.shape)
        L = L.multiply(patt).tocsr()
        U = U.multiply(patt).tocsr()
        du = np.asarray(ilu.U.diagonal())
        U = U + sp.diags(du - U.diagonal())
    ls = sp.tril(L, -1).tocsr()
    ndiag = len(np.unique(
        ls.tocoo().col.astype(np.int64) - ls.tocoo().row.astype(np.int64)
    )) if ls.nnz else 0
    if ndiag > 128:
        warnings.warn(
            f"ILU factor spreads over {ndiag} distinct diagonals — the "
            "gather-free DIA application would materialize "
            f"~{ndiag * n * 8 / 1e9:.1f} GB; falling back to Jacobi "
            "(raise drop_tol to thin the factor)", stacklevel=2)
        return jacobi_preconditioner(_padded_diag(a_sp, n_pad))
    d_u = np.asarray(U.diagonal())
    d_u = np.where(d_u == 0, 1.0, d_u)
    loff, ldiags = _to_dia(ls)
    lmv = dia_matvec_fn(loff, [d.astype(out_dtype) for d in ldiags],
                        n, n)
    dinv = jnp.asarray((1.0 / d_u).astype(out_dtype))

    if symmetric:
        # IC(0)-class: M^-1 = p(L)^T D^-1 p(L), SPD for CG
        ltoff, ltdiags = _to_dia(ls.T.tocsr())
        ltmv = dia_matvec_fn(ltoff, [d.astype(out_dtype) for d in ltdiags],
                             n, n)

        def precond(r):
            rn = r[:n]
            z = rn
            for _ in range(sweeps):       # z ~= inv(L) r
                z = rn - lmv(z)
            v = dinv * z
            y = v
            for _ in range(sweeps):       # y ~= inv(L^T) v
                y = v - ltmv(y)
            if r.shape[0] == n:
                return y
            return jnp.zeros(r.shape, y.dtype).at[:n].set(y)

        return precond

    us = sp.triu(U, 1).tocsr()
    uoff, udiags = _to_dia(us)
    umv = dia_matvec_fn(uoff, [d.astype(out_dtype) for d in udiags],
                        n, n)

    def precond(r):
        rn = r[:n]
        z = rn
        for _ in range(sweeps):           # L z = r, unit diagonal
            z = rn - lmv(z)
        y0 = dinv * z
        y = y0
        for _ in range(sweeps):           # U y = z
            y = y0 - dinv * umv(y)
        if r.shape[0] == n:
            return y
        return jnp.zeros(r.shape, y.dtype).at[:n].set(y)

    return precond


def make_iterative_solve(matvec: Callable, *, symmetric: bool,
                         tol: float = 1e-10, maxiter: int = 1000,
                         precond: Optional[Callable] = None) -> Callable:
    """Wrap a shifted matvec ``v -> (A - sigma M) v`` into a traceable
    ``solve(b)`` suitable for :func:`ops.transforms.shift_invert_operator`."""
    inner = cg if symmetric else bicgstab
    return partial(inner, matvec, tol=tol, maxiter=maxiter, precond=precond)
