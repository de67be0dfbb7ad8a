"""Fused non-symmetric/complex device path tests: device Schur iteration
vs LAPACK, fused-vs-hybrid strategy agreement, real-via-complexification
(SURVEY hard-parts #3 resolution)."""
import numpy as np
import pytest
import scipy.linalg as sla

import jax
import jax.numpy as jnp

import arpack_ng_tpu as at
from arpack_ng_tpu import models
from arpack_ng_tpu.core.device_nonsym import (make_hessenberg_schur,
                                              make_last_components)

from conftest import residual


class TestDeviceSchur:
    @pytest.mark.parametrize("k", [4, 12, 24])
    def test_matches_lapack(self, k, rng):
        H = np.triu(rng.standard_normal((k, k))
                    + 1j * rng.standard_normal((k, k)), -1
                    ).astype(np.complex128)
        schur = jax.jit(make_hessenberg_schur(k, jnp.complex128,
                                              sweeps=4 * k))
        T, Q = map(np.asarray, schur(jnp.asarray(H)))
        assert np.abs(Q.conj().T @ Q - np.eye(k)).max() < 1e-12
        assert np.abs(Q.conj().T @ H @ Q - T).max() < 1e-12
        assert np.abs(np.tril(T, -1)).max() < 1e-12
        np.testing.assert_allclose(
            np.sort_complex(np.diag(T)),
            np.sort_complex(np.linalg.eigvals(H)), atol=1e-11)

    def test_last_components(self, rng):
        k = 16
        H = np.triu(rng.standard_normal((k, k))
                    + 1j * rng.standard_normal((k, k)), -1
                    ).astype(np.complex128)
        schur = jax.jit(make_hessenberg_schur(k, jnp.complex128, 4 * k))
        T, Q = schur(jnp.asarray(H))
        comp = np.asarray(jax.jit(make_last_components(k, jnp.complex128))(
            T, Q))
        w2, Y = sla.eig(H)
        lam = np.diag(np.asarray(T))
        for i in range(k):
            j = np.argmin(np.abs(w2 - lam[i]))
            assert abs(comp[i] - abs(Y[-1, j])) < 1e-9


class TestFusedStrategy:
    def test_complex_fused_matches_hybrid(self, rng):
        n = 100
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
        kw = dict(k=4, which="LM", ncv=20, tol=1e-10, maxiter=400,
                  return_eigenvectors=False)
        vf = at.eigs(a.astype(np.complex128), strategy="fused", **kw)
        vh = at.eigs(a.astype(np.complex128), strategy="hybrid", **kw)
        np.testing.assert_allclose(np.sort(np.abs(vf)),
                                   np.sort(np.abs(vh)), rtol=1e-8)

    def test_real_via_complexification(self):
        op, a_sp = models.convection_diffusion_2d(10, rho=100.0,
                                                  dtype=np.float64)
        vals, vecs = at.eigs(op, k=4, which="LM", ncv=20, tol=1e-10,
                             strategy="fused", maxiter=400)
        assert residual(a_sp, vals, vecs).max() < 1e-8
        import scipy.sparse.linalg as ssla
        ref = ssla.eigs(a_sp, k=4, which="LM", tol=1e-12,
                        return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(np.abs(vals))[:4],
                                   np.sort(np.abs(ref)), rtol=1e-8)

    @pytest.mark.parametrize("which", ["LM", "LR", "SR", "LI"])
    def test_which_selectors_fused(self, which, rng):
        n = 120
        d = (rng.uniform(0.5, 4, n) * np.exp(2j * np.pi * rng.uniform(
            size=n))).astype(np.complex128)
        op = at.from_diagonal(d, n_pad=at.pad_dim(n))
        vals = at.eigs(op, k=3, which=which, ncv=18, tol=1e-10,
                       maxiter=600, strategy="fused",
                       return_eigenvectors=False)
        from arpack_ng_tpu.core.reduced import sort_key
        key = sort_key(which, d, real_pairs=False)
        ref = d[np.argsort(key)][-3:]
        np.testing.assert_allclose(
            np.sort_complex(np.round(vals, 9)),
            np.sort_complex(np.round(ref, 9)), rtol=1e-7)

    def test_fused_distributed(self):
        from arpack_ng_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8)
        op, a_sp = models.convection_diffusion_2d(12, rho=40.0,
                                                  dtype=np.float64)
        vals, vecs = at.eigs(op, k=3, which="LM", ncv=16, tol=1e-9,
                             strategy="fused", maxiter=400, mesh=mesh)
        assert residual(a_sp, vals, vecs).max() < 1e-7
