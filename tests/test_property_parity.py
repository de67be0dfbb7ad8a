"""Property-based parity sweep: randomized problems across dtypes,
spectra and selectors, cross-checked against scipy.sparse.linalg (which
wraps the reference library) and dense LAPACK — a broad-net analog of the
reference's examples-as-tests tier (SURVEY §4.3)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as sla

import arpack_ng_tpu as at

from conftest import residual


def _random_sym(rng, n, spectrum):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return (q * spectrum) @ q.T


SPECTRA = {
    "spread": lambda rng, n: np.linspace(-5, 5, n),
    "clustered": lambda rng, n: np.concatenate(
        [np.full(n // 2, 1.0) + 1e-4 * rng.standard_normal(n // 2),
         np.linspace(2, 3, n - n // 2)]),
    "geometric": lambda rng, n: 2.0 ** np.linspace(-8, 8, n),
    "signed": lambda rng, n: np.concatenate(
        [-(2.0 ** np.linspace(0, 4, n // 2)),
         2.0 ** np.linspace(0, 4, n - n // 2)]),
}


class TestSymmetricSpectraParity:
    @pytest.mark.parametrize("spectrum", list(SPECTRA))
    @pytest.mark.parametrize("which", ["LM", "LA", "SA"])
    def test_random_sym(self, spectrum, which):
        if spectrum == "geometric" and which == "SA":
            # smallest end of a geometric spectrum is relatively
            # ultra-clustered: Krylov methods (the reference included)
            # need shift-invert here — covered by test_modes shift-invert
            pytest.skip("requires shift-invert (reference-equivalent)")
        rng = np.random.default_rng(hash((spectrum, which)) % 2**31)
        n = 120
        s = SPECTRA[spectrum](rng, n)
        a = _random_sym(rng, n, s)
        vals, vecs = at.eigsh(a, k=4, which=which, ncv=20, tol=1e-10,
                              maxiter=2000)
        assert residual(a, vals, vecs).max() < 1e-7
        # value parity against dense LAPACK on the wanted end
        w = np.linalg.eigvalsh(a)
        if which == "LA":
            ref = w[-4:]
        elif which == "SA":
            ref = w[:4]
        else:
            ref = w[np.argsort(np.abs(w))][-4:]
        np.testing.assert_allclose(np.sort(vals), np.sort(ref),
                                   rtol=1e-7, atol=1e-8)

    @pytest.mark.parametrize("seed", range(4))
    def test_scipy_head_to_head(self, seed):
        rng = np.random.default_rng(seed)
        n = 150
        a = sp.random(n, n, density=0.1, random_state=seed,
                      data_rvs=rng.standard_normal)
        a = (a + a.T).tocsr()
        v0 = rng.standard_normal(n)
        vals = at.eigsh(a.toarray(), k=5, which="LM", ncv=20, tol=1e-10,
                        v0=v0, maxiter=2000, return_eigenvectors=False)
        ref = sla.eigsh(a, k=5, which="LM", ncv=20, tol=1e-12, v0=v0,
                        maxiter=5000, return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(np.abs(vals)),
                                   np.sort(np.abs(ref)), rtol=1e-6)


class TestNonsymParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_nonsym_lm(self, seed):
        rng = np.random.default_rng(100 + seed)
        n = 100
        a = rng.standard_normal((n, n)) / np.sqrt(n)
        vals, vecs = at.eigs(a, k=4, which="LM", ncv=20, tol=1e-10,
                             maxiter=2000)
        assert residual(a, vals, vecs).max() < 1e-7
        w = np.linalg.eigvals(a)
        for v in vals:
            assert np.min(np.abs(w - v)) < 1e-7

    @pytest.mark.parametrize("seed", range(3))
    def test_random_complex_lm(self, seed):
        rng = np.random.default_rng(200 + seed)
        n = 90
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        vals, vecs = at.eigs(a.astype(np.complex128), k=4, which="LM",
                             ncv=20, tol=1e-10, maxiter=2000)
        assert residual(a, vals, vecs).max() < 1e-7


class TestDtypeLadder:
    """Same problem at f32 and f64: results agree to f32 accuracy (the
    reference's s/d variant consistency)."""

    def test_f32_vs_f64(self):
        rng = np.random.default_rng(7)
        n = 150
        d = np.sort(rng.uniform(1, 100, n))
        op32 = at.from_diagonal(d.astype(np.float32),
                                n_pad=at.pad_dim(n))
        op64 = at.from_diagonal(d, n_pad=at.pad_dim(n))
        v32 = at.eigsh(op32, k=4, which="LA", tol=1e-6, maxiter=600,
                       return_eigenvectors=False)
        v64 = at.eigsh(op64, k=4, which="LA", tol=1e-12, maxiter=600,
                       return_eigenvectors=False)
        np.testing.assert_allclose(v32, v64, rtol=1e-4)
