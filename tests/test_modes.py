"""Spectral-transformation mode tests: shift-invert, generalized,
buckling, Cayley — the dsdrv2-6 / dndrv2-4 / zndrv2 driver classes
(EXAMPLES/SYM, EXAMPLES/NONSYM, EXAMPLES/COMPLEX), oracle = scipy (wraps
the reference) and independent residuals."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as sla

import arpack_ng_tpu as at
from arpack_ng_tpu import models
from arpack_ng_tpu.ops import solvers, transforms

from conftest import residual


def _lap1d(n):
    return sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                    [-1, 0, 1], format="csr").astype(np.float64)


def _mass1d(n):
    """Tridiagonal mass matrix (1,4,1)/6 — the dsdrv3 M matrix
    (EXAMPLES/SYM/dsdrv3.f mv routine)."""
    return (sp.diags([np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1], format="csr") / 6.0).astype(np.float64)


class TestSymShiftInvert:
    """dsdrv2: standard shift-invert, eigenvalues closest to sigma."""

    def test_mode3_standard(self):
        n = 200
        a = _lap1d(n)
        sigma = 1.013  # NOTE: 1.0 is exactly an eigenvalue here
        vals, vecs = at.eigsh(a.toarray(), k=4, sigma=sigma, which="LM",
                              tol=1e-10, maxiter=300)
        ref = sla.eigsh(a, k=4, sigma=sigma, which="LM",
                        return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-8)
        assert residual(a, vals, vecs).max() < 1e-8

    def test_mode3_smallest_via_shift(self):
        # classic use: smallest eigenvalues via sigma=0
        n = 300
        a = _lap1d(n)
        vals, vecs = at.eigsh(a.toarray(), k=5, sigma=0.0, which="LM",
                              tol=1e-10)
        exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, 6) / (n + 1))
        np.testing.assert_allclose(np.sort(vals), exact, rtol=1e-8)
        assert residual(a, vals, vecs).max() < 1e-8


class TestSymGeneralized:
    """dsdrv3 (mode 2) and dsdrv4 (mode 3 generalized)."""

    def test_mode2(self):
        n = 150
        a, m = _lap1d(n), _mass1d(n)
        vals, vecs = at.eigsh(a.toarray(), k=4, M=m.toarray(), which="LM",
                              tol=1e-10, maxiter=600)
        ref = sla.eigsh(a, k=4, M=m, which="LM", return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-7)
        assert residual(a, vals, vecs, m).max() < 1e-7

    def test_mode3_generalized(self):
        n = 150
        a, m = _lap1d(n), _mass1d(n)
        sigma = 1.0
        vals, vecs = at.eigsh(a.toarray(), k=4, M=m.toarray(), sigma=sigma,
                              which="LM", tol=1e-10)
        ref = sla.eigsh(a, k=4, M=m, sigma=sigma, which="LM",
                        return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-8)
        assert residual(a, vals, vecs, m).max() < 1e-8

    def test_mode4_buckling(self):
        n = 120
        a, m = _lap1d(n), _mass1d(n)
        sigma = 1.0
        vals, vecs = at.eigsh(a.toarray(), k=3, M=m.toarray(), sigma=sigma,
                              mode="buckling", which="LM", tol=1e-9,
                              maxiter=600)
        ref = sla.eigsh(a, k=3, M=m, sigma=sigma, mode="buckling",
                        which="LM", return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-6)
        assert residual(a, vals, vecs, m).max() < 1e-6

    def test_mode5_cayley(self):
        n = 120
        a, m = _lap1d(n), _mass1d(n)
        sigma = 1.0
        vals, vecs = at.eigsh(a.toarray(), k=3, M=m.toarray(), sigma=sigma,
                              mode="cayley", which="LM", tol=1e-9,
                              maxiter=600)
        ref = sla.eigsh(a, k=3, M=m, sigma=sigma, mode="cayley",
                        which="LM", return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-6)
        assert residual(a, vals, vecs, m).max() < 1e-6


class TestNonsymShiftInvert:
    """dndrv2: real shift-invert for non-symmetric problems."""

    def test_mode3_real_shift(self):
        n = 150
        _, a = models.convection_diffusion_1d(n, rho=10.0,
                                              dtype=np.float64)
        sigma = 1.0
        vals, vecs = at.eigs(a.toarray(), k=4, sigma=sigma, which="LM",
                             tol=1e-10)
        ref = sla.eigs(a, k=4, sigma=sigma, which="LM",
                       return_eigenvectors=False)
        np.testing.assert_allclose(np.sort_complex(np.round(vals, 9)),
                                   np.sort_complex(np.round(ref, 9)),
                                   rtol=1e-6)
        assert residual(a, vals, vecs).max() < 1e-8


class TestComplexShiftInvert:
    """zndrv2: complex shift-invert."""

    def test_mode3_complex(self, rng):
        n = 120
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        sigma = 0.3 + 0.2j
        vals, vecs = at.eigs(a.astype(np.complex128), k=4, sigma=sigma,
                             which="LM", tol=1e-10)
        w = np.linalg.eigvals(a)
        close = w[np.argsort(np.abs(w - sigma))][:4]
        np.testing.assert_allclose(np.sort(np.abs(vals - sigma)),
                                   np.sort(np.abs(close - sigma)),
                                   rtol=1e-7)
        assert residual(a, vals, vecs).max() < 1e-8


class TestIterativeSolve:
    """Matrix-free shift-invert via the device CG solver — the arpackmm
    --slv CG iterative mode-solver path (arpackmm.cpp:445-476)."""

    def test_cg_shift_invert(self):
        n = 200
        op, a = models.laplacian_1d(n, dtype=np.float64)
        sigma = 0.0
        shifted = lambda v: op.a_apply(v) - sigma * v
        solve = solvers.make_iterative_solve(shifted, symmetric=True,
                                             tol=1e-12, maxiter=2000)
        siop = transforms.shift_invert_operator(
            n, np.float64, solve, sigma=sigma, mode=3, n_pad=op.n_pad,
            hermitian=True, a_apply=op.a_apply)
        vals, vecs = at.eigsh(siop, k=3, which="LM", tol=1e-9, maxiter=300)
        exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, 4) / (n + 1))
        np.testing.assert_allclose(np.sort(vals), exact, rtol=1e-7)
        assert residual(a, vals, vecs).max() < 1e-7

    def test_bicgstab_nonsym(self):
        n = 150
        op, a = models.convection_diffusion_1d(n, rho=10.0,
                                               dtype=np.float64)
        sigma = 0.5
        shifted = lambda v: op.a_apply(v) - sigma * v
        solve = solvers.make_iterative_solve(shifted, symmetric=False,
                                             tol=1e-12, maxiter=4000)
        siop = transforms.shift_invert_operator(
            n, np.float64, solve, sigma=sigma, mode=3, n_pad=op.n_pad,
            a_apply=op.a_apply)
        cfgk = 3
        vals, vecs = at.eigs(siop, k=cfgk, which="LM", tol=1e-8,
                             maxiter=300)
        assert residual(a, vals, vecs).max() < 1e-6


class TestComplexGeneralized:
    """zndrv3/zndrv4-class: complex generalized problems (mode 2 and
    complex shift-invert mode 3 with a mass matrix)."""

    def test_complex_gen_mode2(self, rng):
        n = 100
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        m = np.eye(n) + 0.1 * sp.diags(
            [np.ones(n - 1), np.ones(n - 1)], [-1, 1]).toarray()
        m = m.astype(np.complex128)
        vals, vecs = at.eigs(a.astype(np.complex128), k=4, M=m,
                             which="LM", tol=1e-10, maxiter=800)
        assert residual(a, vals, vecs, m).max() < 1e-7

    def test_complex_gen_shift_invert(self, rng):
        n = 100
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        m = (np.eye(n) + 0.1 * sp.diags(
            [np.ones(n - 1), np.ones(n - 1)], [-1, 1]).toarray()
        ).astype(np.complex128)
        sigma = 0.2 - 0.1j
        vals, vecs = at.eigs(a.astype(np.complex128), k=3, M=m,
                             sigma=sigma, which="LM", tol=1e-10)
        assert residual(a, vals, vecs, m).max() < 1e-7
        import scipy.linalg
        w = scipy.linalg.eig(a, m, right=False)
        closest = w[np.argmin(np.abs(w - sigma))]
        assert np.min(np.abs(vals - closest)) < 1e-7
