"""Singular value decomposition via Lanczos — the dsvd/ssvd driver
equivalent (EXAMPLES/SVD/dsvd.f).

The reference computes the leading singular triplets of an m x n matrix A
by running the symmetric solver on OP = A^T A (dsvd.f:60) and recovering
left vectors as u = A v / sigma (dsvd.f:37-38,419).  Here the same
construction is dtype-generic and works for any traceable matvec pair
(A, A^H); `svds` mirrors scipy.sparse.linalg.svds' signature.

For m < n the smaller Gram operator A A^H is used instead (v = A^H u /
sigma) — the natural extension the reference leaves to the user.

Beyond the reference, ``method='augmented'`` runs Lanczos on the cyclic
operator ``C = [[0, A], [A^H, 0]]`` (eigenvalues ±sigma_i, eigenvectors
(u_i; v_i)/sqrt(2)).  This is the Golub–Kahan bidiagonalization in
disguise (Lanczos on C from a (y; 0) start alternates the two GKL
half-recurrences) and avoids the normal equations' squared condition
number: singular-value accuracy is ~eps*kappa(A) instead of
~eps*kappa(A)^2 — decisive in float32 where the Gram spectrum underflows
eps for kappa > ~2^12.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import pad_dim
from ..ops.operator import Operator
from .. import api as _api


def _matvec_pair_from(A, dtype=None) -> Tuple[Callable, Callable, int, int,
                                              np.dtype]:
    """(av, ahv, m, n, dtype) from dense/sparse input; padded closures."""
    import scipy.sparse as sp
    if sp.issparse(A):
        A = A.toarray()
    a = np.asarray(A)
    if dtype is not None:
        a = a.astype(dtype)
    m, n = a.shape
    a_dev = jnp.asarray(a)
    ah_dev = jnp.asarray(a.conj().T)

    def av(x):      # (n,) -> (m,)
        return a_dev @ x

    def ahv(y):     # (m,) -> (n,)
        return ah_dev @ y

    return av, ahv, m, n, a.dtype


def svds(
    A=None,
    k: int = 6,
    *,
    matvec: Optional[Callable] = None,
    rmatvec: Optional[Callable] = None,
    shape: Optional[Tuple[int, int]] = None,
    which: str = "LM",
    ncv: Optional[int] = None,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    return_singular_vectors: bool = True,
    dtype=None,
    seed: int = 0,
    method: str = "normal",
    mesh=None,
):
    """Compute the k largest (``which='LM'``, dsvd behavior) or smallest
    (``'SM'``) singular triplets.  Returns (u, s, vh) with s ascending,
    scipy-compatible.

    ``method='normal'`` is the reference's Gram-operator construction
    (dsvd.f:60); ``method='augmented'`` uses the cyclic operator
    [[0, A], [A^H, 0]] for kappa- instead of kappa^2-limited accuracy
    (``which='LM'`` only).

    ``mesh``: optional jax.sharding.Mesh — the Lanczos basis and iterates
    are row-sharded over the Gram (or cyclic) dimension exactly as in
    ``eigsh(..., mesh=)``; the A/A^H applies run under GSPMD (beyond the
    reference: EXAMPLES/SVD/dsvd.f is sequential)."""
    if A is not None:
        av, ahv, m, n, dt = _matvec_pair_from(A, dtype)
    else:
        if matvec is None or rmatvec is None or shape is None:
            raise ValueError("need A, or (matvec, rmatvec, shape)")
        av, ahv = matvec, rmatvec
        m, n = shape
        dt = np.dtype(dtype or np.float32)

    if method not in ("normal", "augmented"):
        raise ValueError("method must be 'normal' or 'augmented'")
    if method == "augmented":
        if which != "LM":
            raise ValueError("method='augmented' supports which='LM' only")
        return _svds_augmented(av, ahv, m, n, np.dtype(dt), k, ncv, tol,
                               maxiter, return_singular_vectors, seed,
                               mesh=mesh)

    use_gram_right = n <= m   # Lanczos on A^H A (dim n) vs A A^H (dim m)
    dim = n if use_gram_right else m
    dim_pad = pad_dim(dim)

    if use_gram_right:
        def gram(x):
            return ahv(av(x))
    else:
        def gram(x):
            return av(ahv(x))

    def padded_gram(x):
        y = gram(x[:dim])
        if dim_pad == dim:
            return y
        return jnp.zeros((dim_pad,), x.dtype).at[:dim].set(y)

    hermitian_dtype = np.dtype(dt)
    op = Operator(n=dim, dtype=hermitian_dtype,
                  apply=lambda v, bv: (padded_gram(v),) * 2,
                  bmat="I", mode=1, a_apply=padded_gram, n_pad=dim_pad,
                  hermitian=True)

    # singular values^2 are the Gram eigenvalues: 'LM' -> 'LA' (PSD
    # spectrum), 'SM' -> 'SA'
    w_map = {"LM": "LA", "SM": "SA"}
    if which not in w_map:
        raise ValueError("which must be 'LM' or 'SM' for svds")
    # complex Gram operators are HERMITIAN and use the Hermitian-Lanczos
    # extension directly (the reference, lacking a c/z Hermitian driver,
    # would pay the ~2x general-complex cost here)
    vals, vecs = _api.eigsh(op, k=k, which=w_map[which], ncv=ncv,
                            tol=tol, maxiter=maxiter if maxiter else 600,
                            seed=seed, mesh=mesh)
    vals = np.maximum(vals, 0.0)
    s = np.sqrt(vals)
    order = np.argsort(s, kind="stable")   # ascending, scipy convention
    s = s[order]
    vecs = vecs[:, order]

    if not return_singular_vectors:
        return s

    # recover the other-side vectors: u = A v / sigma (dsvd.f:419) or
    # v = A^H u / sigma; guard sigma ~ 0 (null-space direction).
    small = vecs  # (dim, k) right vectors if use_gram_right else left
    other_len = m if use_gram_right else n
    apply_other = av if use_gram_right else ahv
    other = np.zeros((other_len, len(s)), dtype=small.dtype)
    for i in range(len(s)):
        w = np.asarray(jax.device_get(
            apply_other(jnp.asarray(small[:, i].astype(dt)))))[:other_len]
        if s[i] > 0:
            other[:, i] = w / s[i]
        else:
            nrm = np.linalg.norm(w)
            other[:, i] = w / nrm if nrm > 0 else w
    if use_gram_right:
        u, v = other, small
    else:
        u, v = small, other
    return u, s, v.conj().T


def _svds_augmented(av, ahv, m, n, dt, k, ncv, tol, maxiter,
                    return_singular_vectors, seed, mesh=None):
    """Largest-k triplets via Lanczos on C = [[0, A], [A^H, 0]] (dim m+n).

    C is Hermitian with eigenvalues ±sigma_i (and |m-n| zeros); the
    which='LA' end delivers the +sigma_i branch.  Eigenvectors split as
    (u_i; v_i)/sqrt(2), so both singular-vector sides come out of one
    solve — no u = A v / sigma back-substitution (and none of its sigma^-1
    amplification)."""
    dim = m + n
    dim_pad = pad_dim(dim)

    def cyc(x):
        y, z = x[:m], x[m:dim]
        top = av(z)[:m]
        bot = ahv(y)[:n]
        out = jnp.concatenate([top, bot])
        if dim_pad == dim:
            return out
        return jnp.zeros((dim_pad,), x.dtype).at[:dim].set(out)

    op = Operator(n=dim, dtype=np.dtype(dt),
                  apply=lambda v, bv: (cyc(v),) * 2,
                  bmat="I", mode=1, a_apply=cyc, n_pad=dim_pad,
                  hermitian=True)
    vals, vecs = _api.eigsh(op, k=k, which="LA", ncv=ncv, tol=tol,
                            maxiter=maxiter if maxiter else 600, seed=seed,
                            mesh=mesh)
    s = np.maximum(np.asarray(vals, dtype=np.float64), 0.0)
    order = np.argsort(s, kind="stable")   # ascending, scipy convention
    s = s[order]
    vecs = vecs[:, order]
    if not return_singular_vectors:
        return s

    u = np.asarray(vecs[:m, :])
    v = np.asarray(vecs[m:, :])
    for i in range(len(s)):
        un = np.linalg.norm(u[:, i])
        vn = np.linalg.norm(v[:, i])
        if un > 0:
            u[:, i] /= un
        if vn > 0:
            v[:, i] /= vn
    return u, s, v.conj().T
