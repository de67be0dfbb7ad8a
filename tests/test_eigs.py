"""Non-symmetric and complex standard-problem tests: the dnsimp / dndrv1 /
zndrv1 classes, with scipy.sparse.linalg.eigs (wrapping the reference) as
the parity oracle."""
import numpy as np
import pytest
import scipy.sparse.linalg as sla

import arpack_ng_tpu as at
from arpack_ng_tpu import models

from conftest import residual


class TestConvectionDiffusion:
    """dnsimp: 2-D convection-diffusion, largest-magnitude eigenvalues
    (EXAMPLES/SIMPLE/dnsimp.f)."""

    def test_dnsimp_lm(self):
        nx = 10
        op, a_sp = models.convection_diffusion_2d(nx, rho=100.0,
                                                  dtype=np.float64)
        vals, vecs = at.eigs(op, k=4, which="LM", ncv=20, tol=1e-10,
                             maxiter=500)
        ref = sla.eigs(a_sp, k=4, which="LM", tol=1e-12,
                       return_eigenvectors=False)
        np.testing.assert_allclose(
            np.sort_complex(vals), np.sort_complex(ref), rtol=1e-6)
        assert residual(a_sp, vals, vecs).max() < 1e-8

    @pytest.mark.parametrize("which", ["LM", "LR", "SR"])
    def test_which_1d(self, which):
        # NOTE: 'LI' on this operator is ill-posed (purely real spectrum);
        # the reference library also fails to converge there (verified via
        # scipy) — LI is covered by test_which_li_real_matrix instead.
        n = 150
        op, a_sp = models.convection_diffusion_1d(n, rho=40.0,
                                                  dtype=np.float64)
        vals, vecs = at.eigs(op, k=5, which=which, ncv=25, tol=1e-10,
                             maxiter=800)
        ref = sla.eigs(a_sp, k=5, which=which, tol=1e-12, ncv=25,
                       maxiter=3000, return_eigenvectors=False)
        np.testing.assert_allclose(
            np.sort_complex(np.round(vals, 8)),
            np.sort_complex(np.round(ref, 8)), rtol=1e-5, atol=1e-8)
        assert residual(a_sp, vals, vecs).max() < 1e-7

    def test_which_li_real_matrix(self, rng):
        n = 120
        a = rng.standard_normal((n, n)) / np.sqrt(n)
        vals, vecs = at.eigs(a, k=4, which="LI", ncv=24, tol=1e-10,
                             maxiter=800)
        w = np.linalg.eigvals(a)
        top = np.sort(np.abs(w.imag))[-4:]
        np.testing.assert_allclose(np.sort(np.abs(vals.imag)), top,
                                   rtol=1e-6)
        assert residual(a, vals, vecs).max() < 1e-7

    def test_complex_pairs_residual(self, rng):
        # random real matrix: spectrum is genuinely complex; verify
        # conjugate-pair handling through residuals
        n = 120
        a = rng.standard_normal((n, n)) / np.sqrt(n)
        vals, vecs = at.eigs(a, k=6, which="LM", ncv=24, tol=1e-10,
                             maxiter=800)
        assert residual(a, vals, vecs).max() < 1e-8
        # like dneupd, k or k+1 values may be returned (a conjugate pair is
        # never split at the selection boundary)
        assert len(vals) in (6, 7)
        nonreal = vals[np.abs(vals.imag) > 1e-10]
        for v in nonreal:
            assert np.min(np.abs(nonreal - np.conj(v))) < 1e-8


class TestComplex:
    """zndrv1-class: complex arithmetic (znaupd/zneupd equivalent)."""

    def test_complex_diagonal(self):
        n = 200
        d = (np.linspace(1, 10, n) + 1j * np.linspace(-5, 5, n))
        op = at.from_diagonal(d.astype(np.complex128),
                              n_pad=at.pad_dim(n))
        vals, vecs = at.eigs(op, k=4, which="LM", ncv=20, tol=1e-10,
                             maxiter=500)
        ref = d[np.argsort(np.abs(d))][-4:]
        np.testing.assert_allclose(np.sort_complex(vals),
                                   np.sort_complex(ref), rtol=1e-8)

    def test_complex_dense_parity(self, rng):
        n = 100
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        vals, vecs = at.eigs(a.astype(np.complex128), k=5, which="LM",
                             ncv=20, tol=1e-10, maxiter=800)
        ref = sla.eigs(a, k=5, which="LM", tol=1e-12,
                       return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(np.abs(vals)),
                                   np.sort(np.abs(ref)), rtol=1e-7)
        assert residual(a, vals, vecs).max() < 1e-8

    def test_complex_which_li(self, rng):
        n = 150
        d = np.linspace(1, 2, n) + 1j * np.linspace(-3, 3, n)
        op = at.from_diagonal(d.astype(np.complex128))
        vals = at.eigs(op, k=3, which="LI", ncv=20, tol=1e-10,
                       maxiter=500, return_eigenvectors=False)
        ref = d[np.argsort(d.imag)][-3:]
        np.testing.assert_allclose(np.sort_complex(vals),
                                   np.sort_complex(ref), rtol=1e-7)


class TestSchur:
    def test_schur_basis(self, rng):
        n = 80
        a = rng.standard_normal((n, n)) / np.sqrt(n)
        vals, Q = at.eigs(a, k=4, which="LM", ncv=20, tol=1e-10,
                          maxiter=800, return_eigenvectors=False,
                          return_schur=True)
        # Q spans an invariant subspace: ||A Q - Q (Q^T A Q)|| small
        aq = a @ Q
        proj = Q @ (Q.T @ aq)
        assert np.linalg.norm(aq - proj) < 1e-7
        # basis orthonormal
        np.testing.assert_allclose(Q.T @ Q, np.eye(Q.shape[1]), atol=1e-8)


class TestF64Validation:
    """eigs(..., validate='f64'): the productized non-normal-f32
    pseudospectrum guidance (docs/PERF.md round-4; round-4 verdict
    weak #5)."""

    def test_warns_on_nonnormal_f32(self):
        # strongly convective operator in f32: detectably non-normal ->
        # PseudospectrumWarning must fire and the report must be attached
        nx = 16
        _, a_sp = models.convection_diffusion_2d(nx, rho=400.0,
                                                 dtype=np.float32)
        a32 = a_sp.astype(np.float32)
        with pytest.warns(at.PseudospectrumWarning):
            vals, vecs, out = at.eigs(a32, k=4, which="LM", ncv=20,
                                      tol=1e-4, maxiter=500,
                                      validate="f64",
                                      return_stats=True)
        rep = out.validation
        assert rep is not None
        assert rep.nonnormality > 1e-6
        assert rep.residuals.shape == vals.shape
        # residual-converged: f64 residuals are honest measurements
        assert np.all(np.isfinite(rep.rel_residuals))

    def test_no_warning_on_normal_f64(self):
        # symmetric (normal) matrix in f64: validation passes silently
        import warnings as _w
        rng = np.random.default_rng(0)
        a = rng.standard_normal((60, 60))
        a = (a + a.T).astype(np.float64)
        with _w.catch_warnings():
            _w.simplefilter("error", at.PseudospectrumWarning)
            vals, vecs, out = at.eigs(a, k=4, which="LM", tol=1e-10,
                                      validate="f64",
                                      return_stats=True)
        assert out.validation.passed
        assert out.validation.nonnormality < 1e-10

    def test_matrix_free_requires_callable(self):
        op, a_sp = models.convection_diffusion_1d(96, rho=10.0,
                                                  dtype=np.float64)
        with pytest.raises(ValueError, match="matrix-free"):
            at.eigs(op, k=3, which="LM", tol=1e-8, validate="f64")
        # callable form: f64 matvec on logical-length vectors
        a64 = a_sp.astype(np.float64)
        vals, _, out = at.eigs(op, k=3, which="LM", tol=1e-8,
                               validate=lambda v: a64 @ v,
                               return_stats=True)
        assert out.validation is not None
        assert out.validation.passed
        assert np.isnan(out.validation.nonnormality)
