"""Fused-device vs hybrid-host strategy cross-validation: the two
execution paths of the same algorithm must agree (the framework's
self-verification analog of the reference's MPI-vs-sequential agreement)."""
import numpy as np
import pytest

import arpack_ng_tpu as at
from arpack_ng_tpu import models


@pytest.mark.parametrize("which", ["LA", "SA", "LM", "SM"])
def test_fused_matches_hybrid(which):
    n = 200
    rng = np.random.default_rng(3)
    d = np.sort(rng.uniform(0.5, 80.0, n))
    op = at.from_diagonal(d, n_pad=at.pad_dim(n))
    v0 = rng.standard_normal(n)
    kw = dict(k=4, which=which, ncv=16, tol=1e-10, maxiter=600, v0=v0,
              return_eigenvectors=False)
    vals_f = at.eigsh(op, strategy="fused", **kw)
    vals_h = at.eigsh(op, strategy="hybrid", **kw)
    np.testing.assert_allclose(np.sort(vals_f), np.sort(vals_h),
                               rtol=1e-9)


def test_fused_stencil_residual():
    nx = 14
    op, a_sp = models.laplacian_2d(nx, dtype=np.float64)
    vals, vecs = at.eigsh(op, k=5, which="LA", ncv=22, tol=1e-10,
                          maxiter=500, strategy="fused")
    for i in range(5):
        r = np.linalg.norm(a_sp @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-8


def test_fused_generalized_mode3():
    import scipy.sparse as sp
    n = 120
    a = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).toarray()
    m = (sp.diags([np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
                  [-1, 0, 1]) / 6.0).toarray()
    kw = dict(k=3, M=m, sigma=1.0, which="LM", tol=1e-10, maxiter=500,
              return_eigenvectors=False)
    vals_f = at.eigsh(a, strategy="fused", **kw)
    vals_h = at.eigsh(a, strategy="hybrid", **kw)
    np.testing.assert_allclose(np.sort(vals_f), np.sort(vals_h),
                               rtol=1e-8)


def test_fused_be():
    """BE on the fused path: even k takes k/2 from each end."""
    op = at.from_diagonal(np.arange(1.0, 101.0))
    vals = at.eigsh(op, k=4, which="BE", tol=1e-10, strategy="fused",
                    return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(vals), [1.0, 2.0, 99.0, 100.0],
                               rtol=1e-9)


@pytest.mark.parametrize("strategy", ["fused", "hybrid"])
@pytest.mark.parametrize("k", [3, 5, 7])
def test_be_odd_k_split_convention(strategy, k):
    """Regression: for odd k, 'BE' takes k//2 from the LOW end and
    k - k//2 from the HIGH end (dsgets.f:166-171, dsaup2.f:551-556 swap;
    both the gets/exit arrangement and the extraction split had this
    inverted, returning one extra low value instead of a high one)."""
    d = np.arange(1.0, 101.0)
    op = at.from_diagonal(d)
    vals = at.eigsh(op, k=k, which="BE", ncv=20, tol=1e-10,
                    strategy=strategy, return_eigenvectors=False)
    lo = k // 2
    want = np.concatenate([d[:lo], d[100 - (k - lo):]])
    np.testing.assert_allclose(np.sort(vals), want, rtol=1e-9)


@pytest.mark.parametrize("which", ["LA", "SA", "LM"])
def test_thick_restart_matches_implicit(which):
    """restart='thick' (Krylov-Schur class) is mathematically equivalent
    to implicit exact-shift restarts [Wu & Simon 2000] — same converged
    values on the same problems."""
    from arpack_ng_tpu import models
    op, a = models.laplacian_2d(30, dtype=np.float64)
    v_t, V_t = at.eigsh(op, k=4, which=which, ncv=20, tol=1e-10,
                        restart="thick", maxiter=3000)
    v_i, _ = at.eigsh(op, k=4, which=which, ncv=20, tol=1e-10,
                      restart="implicit", maxiter=3000)
    np.testing.assert_allclose(np.sort(v_t), np.sort(v_i), rtol=1e-9)
    for i in range(4):
        r = np.linalg.norm(a @ V_t[:, i] - v_t[i] * V_t[:, i])
        assert r < 1e-8


def test_thick_restart_generalized():
    """Thick restart with bmat='G': the arrow coupling reasoning holds in
    the B-inner product (resid and b_resid carried unchanged)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    n = 500
    a = sp.diags([np.ones(n - 1), 4.0 + rng.random(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    m = sp.diags(1.0 + rng.random(n)).tocsr()
    v_t, V_t = at.eigsh(a, k=4, M=m, which="LA", ncv=20, tol=1e-10,
                        restart="thick", maxiter=3000, dtype=np.float64)
    v_i = at.eigsh(a, k=4, M=m, which="LA", ncv=20, tol=1e-10,
                   restart="implicit", maxiter=3000, dtype=np.float64,
                   return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(v_t), np.sort(v_i), rtol=1e-8)
    for i in range(4):
        r = np.linalg.norm(a @ V_t[:, i] - v_t[i] * (m @ V_t[:, i]))
        assert r < 1e-8


def test_thick_rejects_be():
    op = at.from_diagonal(np.arange(1.0, 101.0))
    with pytest.raises(ValueError, match="thick"):
        at.eigsh(op, k=4, which="BE", restart="thick", strategy="fused")
