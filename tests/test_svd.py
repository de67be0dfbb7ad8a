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

    def test_smallest(self, rng):
        a = rng.standard_normal((80, 40))
        s = at.svds(a.astype(np.float64), k=3, which="SM", tol=1e-10,
                    return_singular_vectors=False, maxiter=3000, ncv=30)
        s_ref = np.sort(np.linalg.svd(a, compute_uv=False))
        np.testing.assert_allclose(np.sort(s), s_ref[:3], rtol=1e-6)
