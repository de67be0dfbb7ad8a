"""SVD driver tests (EXAMPLES/SVD/dsvd.f equivalent), oracle =
numpy/scipy dense SVD."""
import numpy as np
import pytest

import arpack_ng_tpu as at


class TestSvds:
    def test_tall_matrix(self, rng):
        m, n = 300, 80
        a = rng.standard_normal((m, n))
        u, s, vh = at.svds(a.astype(np.float64), k=5, tol=1e-10)
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:5]), rtol=1e-8)
        # triplet residuals: ||A v - s u|| and ||A^T u - s v||
        for i in range(5):
            assert np.linalg.norm(a @ vh[i] - s[i] * u[:, i]) < 1e-7
            assert np.linalg.norm(a.T @ u[:, i] - s[i] * vh[i]) < 1e-7

    def test_wide_matrix(self, rng):
        m, n = 60, 200
        a = rng.standard_normal((m, n))
        u, s, vh = at.svds(a.astype(np.float64), k=4, tol=1e-10)
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:4]), rtol=1e-8)
        for i in range(4):
            assert np.linalg.norm(a @ vh[i] - s[i] * u[:, i]) < 1e-7

    def test_complex(self, rng):
        m, n = 150, 60
        a = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
        u, s, vh = at.svds(a.astype(np.complex128), k=3, tol=1e-10)
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:3]), rtol=1e-8)
        for i in range(3):
            assert np.linalg.norm(a @ vh[i].conj() - s[i] * u[:, i]) < 1e-6

    def test_values_only(self, rng):
        a = rng.standard_normal((100, 50))
        s = at.svds(a.astype(np.float64), k=3, tol=1e-10,
                    return_singular_vectors=False)
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:3]), rtol=1e-8)

    def test_augmented_tall(self, rng):
        m, n = 300, 80
        a = rng.standard_normal((m, n))
        u, s, vh = at.svds(a.astype(np.float64), k=5, tol=1e-10,
                           method="augmented")
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:5]), rtol=1e-8)
        for i in range(5):
            assert np.linalg.norm(a @ vh[i] - s[i] * u[:, i]) < 1e-7
            assert np.linalg.norm(a.T @ u[:, i] - s[i] * vh[i]) < 1e-7

    def test_augmented_complex(self, rng):
        m, n = 90, 40
        a = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
        u, s, vh = at.svds(a.astype(np.complex128), k=3, tol=1e-10,
                           method="augmented")
        s_ref = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(s, np.sort(s_ref[:3]), rtol=1e-8)
        for i in range(3):
            assert np.linalg.norm(a @ vh[i].conj() - s[i] * u[:, i]) < 1e-6

    def test_augmented_beats_normal_in_f32(self, rng):
        # kappa(A) = 1e4: the Gram operator's small eigenvalues sigma^2 sit
        # at ~1e-8 * lambda_max — below f32 eps resolution — while the
        # cyclic operator keeps them at sigma itself.  The augmented path's
        # error bound is eps*kappa, the normal path's eps*kappa^2.
        m, n, k = 50, 8, 6
        s_true = np.logspace(0, -4, n)
        qu, _ = np.linalg.qr(rng.standard_normal((m, n)))
        qv, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a = (qu * s_true) @ qv.T
        want = np.sort(s_true)[-k:]

        s_aug = at.svds(a, k=k, dtype=np.float32, method="augmented",
                        return_singular_vectors=False, maxiter=2000)
        s_nrm = at.svds(a, k=k, dtype=np.float32, method="normal",
                        return_singular_vectors=False, maxiter=2000)
        err_aug = np.max(np.abs(s_aug - want) / want)
        err_nrm = np.max(np.abs(s_nrm - want) / want)
        assert err_aug < 1e-3
        # the ordering assertion only means something when the normal
        # path actually struggles — when BOTH land at the f32 noise
        # floor (~eps*kappa = 1e-3*eps_f32 here), which is smaller is
        # contraction-order rounding luck
        assert err_aug < err_nrm or err_nrm < 5e-6

    def test_smallest(self, rng):
        a = rng.standard_normal((80, 40))
        s = at.svds(a.astype(np.float64), k=3, which="SM", tol=1e-10,
                    return_singular_vectors=False, maxiter=3000, ncv=30)
        s_ref = np.sort(np.linalg.svd(a, compute_uv=False))
        np.testing.assert_allclose(np.sort(s), s_ref[:3], rtol=1e-6)

    def test_mesh_sharded(self, rng):
        """mesh= on svds (beyond reference — EXAMPLES/SVD/dsvd.f is
        sequential): the Gram/cyclic Lanczos runs with a row-sharded
        basis on the 8-virtual-device mesh and matches the unsharded
        solve and numpy."""
        import jax
        from jax.sharding import Mesh
        a = rng.standard_normal((256, 128)).astype(np.float64)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("rows",))
        u, s, vh = at.svds(a, k=3, tol=1e-10, mesh=mesh)
        s_ref = np.sort(np.linalg.svd(a, compute_uv=False))[::-1][:3]
        np.testing.assert_allclose(np.sort(s)[::-1], s_ref, rtol=1e-9)
        # residual oracle: A v = s u
        for i in range(3):
            r = np.linalg.norm(a @ vh.conj().T[:, i] - s[i] * u[:, i])
            assert r < 1e-8 * max(s)
        s0 = at.svds(a, k=3, tol=1e-10, return_singular_vectors=False)
        np.testing.assert_allclose(np.sort(s), np.sort(s0), rtol=1e-10)
        # augmented method under the same mesh
        s_aug = at.svds(a, k=3, tol=1e-10, method="augmented",
                        return_singular_vectors=False, mesh=mesh)
        np.testing.assert_allclose(np.sort(s_aug), s_ref[::-1], rtol=1e-8)
