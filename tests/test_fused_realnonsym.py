"""Fused REAL non-symmetric path (core/device_realnonsym.py): device
real Schur + pair-preserving shifts, all in real arithmetic — the
dnaupd-class loop that runs on complex-incapable backends.

Oracles: scipy dense/sparse (wrapping the reference) for value parity,
independent-matvec residuals, and structural checks on the device real
Schur machinery itself."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import arpack_ng_tpu as at
from arpack_ng_tpu.config import IRAMConfig
from arpack_ng_tpu.core import device_realnonsym as drn
from arpack_ng_tpu.core.device_realnonsym import FusedRealNonsymSolver
from arpack_ng_tpu.core.extract import extract
from arpack_ng_tpu.ops import sparse as ops_sparse


def _banded_nonsym(rng, n=600):
    """Random-diagonal nonsym band: well-separated extremes, complex
    conjugate pairs in the interior."""
    return (sp.diags(2.0 + rng.standard_normal(n))
            + sp.diags(-1.5 * np.ones(n - 1), 1)
            + sp.diags(-0.5 * np.ones(n - 1), -1)).tocsr()


def _rotation_blocks(rng, nb=150):
    """Block-diagonal 2x2 rotations: spectrum a_i +- i b_i with spread
    imaginary parts (exercises LI and conjugate-pair bookkeeping)."""
    blocks = []
    for i in range(nb):
        a = rng.standard_normal() * 0.3
        b = (i + 1) / nb * 3.0 + 0.1 * rng.standard_normal()
        blocks.append(np.array([[a, b], [-b, a]]))
    return sp.block_diag(blocks).tocsr()


class TestRealSchurMachinery:
    def test_schur_eigs_lastcomps_vs_lapack(self, rng):
        k = 12
        H = np.triu(rng.standard_normal((k, k)), -1)
        sub = np.abs(H[np.arange(1, k), np.arange(k - 1)])
        H[np.arange(1, k), np.arange(k - 1)] = sub
        schur = drn.make_real_schur(k, jnp.float64, sweeps=8 * k)
        T, Q = map(np.asarray, schur(jnp.asarray(H)))
        assert np.abs(Q.T @ Q - np.eye(k)).max() < 1e-12
        assert np.abs(Q @ T @ Q.T - H).max() < 1e-10 * np.abs(H).max()
        assert np.abs(np.tril(T, -2)).max() < 1e-10      # quasi-triangular
        subT = np.diag(T, -1)
        assert not np.any((np.abs(subT[:-1]) > 1e-12)
                          & (np.abs(subT[1:]) > 1e-12))  # blocks 2x2 max
        wr, wi, _, _ = map(np.asarray, drn.real_block_eigs(jnp.asarray(T)))
        np.testing.assert_allclose(
            np.sort_complex(wr + 1j * wi),
            np.sort_complex(np.linalg.eigvals(H)), atol=1e-10)
        lcf = drn.make_real_last_components(k, jnp.float64)
        lc, wr2, wi2, _, _ = map(np.asarray,
                                 lcf(jnp.asarray(T), jnp.asarray(Q)))
        w_ref, Y = np.linalg.eig(H)
        lam = wr2 + 1j * wi2
        for i in range(k):
            j = int(np.argmin(np.abs(w_ref - lam[i])))
            ref = abs(Y[-1, j]) / np.linalg.norm(Y[:, j])
            assert abs(lc[i] - ref) < 1e-8


class TestFusedRealNonsym:
    @pytest.mark.parametrize("which", ["LM", "LR", "SR"])
    def test_banded_matches_scipy(self, which, rng):
        a = _banded_nonsym(rng)
        op = ops_sparse.from_scipy(a, hermitian=False, format="dia")
        cfg = IRAMConfig(n=op.n, nev=6, ncv=30, which=which,
                         symmetric=False, dtype=np.dtype(np.float64),
                         n_pad=op.n_pad, tol=1e-10, max_iter=1500)
        res = FusedRealNonsymSolver(op, cfg).solve()
        out = extract(op, cfg, res, rvec=True, howmny="A")
        assert out.nconv >= 6
        vals, vecs = out.values, out.vectors
        for i in range(6):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-8 * max(abs(vals[i]), 1.0)
        import scipy.sparse.linalg as spla
        sv = spla.eigs(a, k=6, which=which, ncv=30,
                       return_eigenvectors=False, maxiter=8000)
        np.testing.assert_allclose(np.sort_complex(np.round(vals[:6], 6)),
                                   np.sort_complex(np.round(sv, 6)),
                                   atol=1e-4)

    def test_li_conjugate_pairs(self, rng):
        a = _rotation_blocks(rng)
        op = ops_sparse.from_scipy(a, hermitian=False, format="dia")
        cfg = IRAMConfig(n=op.n, nev=6, ncv=30, which="LI",
                         symmetric=False, dtype=np.dtype(np.float64),
                         n_pad=op.n_pad, tol=1e-10, max_iter=1500)
        res = FusedRealNonsymSolver(op, cfg).solve()
        out = extract(op, cfg, res, rvec=True, howmny="A")
        assert out.nconv >= 6
        vals = out.values[:6]
        # eigenvalues of a real matrix: conjugate-closed set
        assert np.allclose(np.sort_complex(vals),
                           np.sort_complex(np.conj(vals)), atol=1e-6)
        for i in range(6):
            r = np.linalg.norm(a @ out.vectors[:, i]
                               - vals[i] * out.vectors[:, i])
            assert r < 1e-6 * max(abs(vals[i]), 1.0)

    def test_api_strategy_fused_real(self, rng):
        a = _banded_nonsym(rng, n=400)
        vals, vecs = at.eigs(a, k=4, which="LM", ncv=24, tol=1e-10,
                             maxiter=1500, strategy="fused_real",
                             dtype=np.float64)
        vals_h, _ = at.eigs(a, k=4, which="LM", ncv=24, tol=1e-10,
                            maxiter=1500, strategy="hybrid",
                            dtype=np.float64)
        np.testing.assert_allclose(np.sort_complex(np.round(vals, 7)),
                                   np.sort_complex(np.round(vals_h, 7)),
                                   atol=1e-5)
        for i in range(4):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-8 * max(abs(vals[i]), 1.0)

    def test_f32(self, rng):
        a = _banded_nonsym(rng, n=500).astype(np.float32)
        vals, vecs = at.eigs(a, k=4, which="LM", ncv=24, tol=1e-4,
                             maxiter=2000, strategy="fused_real")
        for i in range(4):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-2 * max(abs(vals[i]), 1.0)

    def test_rejects_complex(self, rng):
        a = (rng.standard_normal((50, 50))
             + 1j * rng.standard_normal((50, 50)))
        with pytest.raises(ValueError, match="fused_real"):
            at.eigs(a.astype(np.complex128), k=3, strategy="fused_real")

    def test_generalized(self, rng):
        """A x = lambda M x (bmat='G') through the fused real cycle."""
        n = 400
        a = _banded_nonsym(rng, n=n)
        m = sp.diags(1.0 + 0.5 * rng.random(n)).tocsr()
        vals, vecs = at.eigs(a, k=4, M=m, which="LM", ncv=24, tol=1e-10,
                             maxiter=1500, strategy="fused_real",
                             dtype=np.float64)
        for i in range(4):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * (m @ vecs[:, i]))
            assert r < 1e-8 * abs(vals[i])

    def test_shift_invert(self, rng):
        a = _banded_nonsym(rng, n=400)
        vals, vecs = at.eigs(a, k=4, sigma=2.0, which="LM", ncv=24,
                             tol=1e-10, maxiter=1500,
                             strategy="fused_real", dtype=np.float64)
        vals_h, _ = at.eigs(a, k=4, sigma=2.0, which="LM", ncv=24,
                            tol=1e-10, maxiter=1500, strategy="hybrid",
                            dtype=np.float64)
        np.testing.assert_allclose(np.sort_complex(np.round(vals, 7)),
                                   np.sort_complex(np.round(vals_h, 7)),
                                   atol=1e-5)
        for i in range(4):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-6 * abs(vals[i])

    def test_conv_diffusion_lm(self):
        from arpack_ng_tpu import models
        op, a = models.convection_diffusion_2d(14, dtype=np.float64)
        cfg = IRAMConfig(n=op.n, nev=6, ncv=24, which="LM",
                         symmetric=False, dtype=np.dtype(np.float64),
                         n_pad=op.n_pad, tol=1e-10, max_iter=500)
        res = FusedRealNonsymSolver(op, cfg).solve()
        out = extract(op, cfg, res, rvec=True, howmny="A")
        assert out.nconv >= 6
        for i in range(6):
            r = np.linalg.norm(a @ out.vectors[:, i]
                               - out.values[i] * out.vectors[:, i])
            assert r < 1e-8 * max(abs(out.values[i]), 1.0)
