"""Realification fallback tests: complex problems through the real
drivers (for backends without complex-arithmetic support)."""
import numpy as np
import pytest

from arpack_ng_tpu.ops.realify import eigs_realified, realify_dense


def test_general_complex(rng):
    n = 90
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
    vals, vecs = eigs_realified(a.astype(np.complex128), k=4, which="LM",
                                tol=1e-10, maxiter=1000)
    assert len(vals) == 4
    w = np.linalg.eigvals(a)
    wtop = np.sort(np.abs(w))[-4:]
    np.testing.assert_allclose(np.sort(np.abs(vals)), wtop, rtol=1e-7)
    for i in range(4):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7


def test_hermitian_routes_symmetric(rng):
    n = 100
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = ((a + a.conj().T) / 2).astype(np.complex128)
    op = realify_dense(a)
    assert op.hermitian
    vals, vecs = eigs_realified(a, k=3, which="LA", tol=1e-10)
    w = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(vals.real), w[-3:], rtol=1e-8)
    for i in range(3):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7


def test_rejects_real_input(rng):
    with pytest.raises(ValueError, match="complex"):
        realify_dense(rng.standard_normal((10, 10)))


def test_sparse_general_complex(rng):
    """Complex SPARSE matrix through the real drivers: the realified
    [[Ar,-Ai],[Ai,Ar]] block matrix rides the structure-exploiting
    sparse importer (DIA for banded inputs) — complex problems scale on
    real-only backends without densification."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from arpack_ng_tpu.ops.realify import eigs_realified

    n = 800
    d0 = 3.0 + rng.standard_normal(n) + 1j * rng.standard_normal(n)
    d1 = rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)
    a = (sp.diags(d0) + sp.diags(d1, 1)
         + sp.diags(0.5 * d1.conj(), -1)).tocsr()
    vals, vecs = eigs_realified(a, k=4, which="LM", tol=1e-10,
                                maxiter=3000)
    assert len(vals) == 4
    for i in range(4):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-8
    sv = spla.eigs(a, k=4, which="LM", return_eigenvectors=False,
                   maxiter=8000)
    np.testing.assert_allclose(np.sort_complex(np.round(vals, 6)),
                               np.sort_complex(np.round(sv, 6)),
                               atol=1e-4)


def test_sparse_hermitian_complex(rng):
    import scipy.sparse as sp
    from arpack_ng_tpu.ops.realify import eigs_realified

    n = 800
    h1 = rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)
    a = (sp.diags(h1, 1) + sp.diags(h1.conj(), -1)
         + sp.diags(4.0 + rng.standard_normal(n))).tocsr()
    vals, vecs = eigs_realified(a, k=3, which="LM", tol=1e-10,
                                maxiter=3000)
    assert len(vals) == 3
    assert np.max(np.abs(np.imag(vals))) < 1e-8  # Hermitian: real spectrum
    for i in range(3):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7


def test_exact_k_delivery_real_spectrum(rng):
    # A complex matrix with an (almost) REAL spectrum: every eigenvalue's
    # realified conjugate copy coincides with it, so naive 2k-selection
    # yields only k distinct values — the dedup + retry logic must still
    # deliver exactly k genuine pairs.
    n = 40
    q, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    lam = np.linspace(1.0, 5.0, n)            # real spectrum
    a = (q * lam) @ q.conj().T                # Hermitian-by-construction
    a = np.asarray(a, np.complex128)
    vals, vecs = eigs_realified(a, k=4, which="LM", tol=1e-10,
                                        maxiter=2000)
    assert len(vals) == 4
    res = [np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
           for i in range(4)]
    assert max(res) < 1e-7


def test_under_delivery_retry_one_sided_selector(rng):
    # Asymmetric spectrum + 'LI': the conjugate copies of the most
    # negative-imaginary eigenvalues rank TOP for largest-imaginary and
    # are rejected by the copy filter — the solver must widen the
    # subspace (retry) and still deliver k genuine pairs.
    n = 30
    lam = (rng.standard_normal(n) + 1j * (-np.abs(rng.standard_normal(n))
                                          - 0.5))   # all imag < 0
    q, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    a = (q * lam) @ np.linalg.inv(q)
    vals, vecs = eigs_realified(a, k=3, which="LI", tol=1e-8,
                                        maxiter=3000)
    assert len(vals) == 3
    for i in range(3):
        assert np.min(np.abs(lam - vals[i])) < 1e-5
        assert np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i]) \
            < 1e-5


def test_under_delivery_warns_instead_of_silent_short_return(monkeypatch):
    # if recovery cannot reach k even at the maximum subspace size, the
    # caller must get a warning (round-1 review: "can silently return
    # fewer than k pairs ... no test covers the under-delivery path")
    import arpack_ng_tpu.ops.realify as rf
    monkeypatch.setattr(
        rf, "_recover",
        lambda vals, vecs, a, n, half, k, tol=0.0:
        (np.array([]), np.zeros((a.shape[0], 0), complex)))
    a = np.diag(np.array([1.0 + 1.0j, 2.0 - 0.5j, 3.0 + 0.2j]))
    with pytest.warns(UserWarning, match="recovered 0 of 2"):
        vals, vecs = rf.eigs_realified(a, k=2, which="LM", tol=1e-10)
    assert len(vals) == 0 and vecs.shape == (3, 0)
