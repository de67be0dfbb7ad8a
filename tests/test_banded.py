"""Banded driver tests (EXAMPLES/BAND dsband/dnband classes)."""
import numpy as np
import pytest
import scipy.linalg as sla_d
import scipy.sparse as sp

import arpack_ng_tpu as at
from arpack_ng_tpu.ops import banded

from conftest import residual


def _lap_band(n):
    """1-D Laplacian in LAPACK band storage (kl=ku=1)."""
    ab = np.zeros((3, n))
    ab[0, 1:] = -1.0   # superdiag
    ab[1, :] = 2.0     # diag
    ab[2, :-1] = -1.0  # subdiag
    return ab


def _penta_band(n, rng):
    """Random symmetric pentadiagonal (kl=ku=2)."""
    d0 = rng.uniform(4, 6, n)
    d1 = rng.uniform(-1, 1, n - 1)
    d2 = rng.uniform(-0.5, 0.5, n - 2)
    a = (sp.diags([d2, d1, d0, d1, d2], [-2, -1, 0, 1, 2])).tocsr()
    ab = np.zeros((5, n))
    ab[0, 2:] = d2
    ab[1, 1:] = d1
    ab[2, :] = d0
    ab[3, :-1] = d1
    ab[4, :-2] = d2
    return ab, a


class TestBandedMatvec:
    def test_matches_sparse(self, rng):
        n = 100
        ab, a = _penta_band(n, rng)
        mv = banded.banded_matvec_fn(ab, 2, 2, n, 128)
        x = rng.standard_normal(128)
        x[100:] = 0.0
        import jax.numpy as jnp
        y = np.asarray(mv(jnp.asarray(x)))
        np.testing.assert_allclose(y[:n], a @ x[:n], rtol=1e-12)
        assert np.all(y[n:] == 0)


class TestBandedEigsh:
    def test_mode1(self):
        n = 120
        ab = _lap_band(n)
        vals, vecs = banded.eigsh_banded(ab, 1, 1, k=4, which="LA",
                                         tol=1e-10, dtype=np.float64)
        exact = 2 - 2 * np.cos(np.pi * np.arange(n, n - 4, -1) / (n + 1))
        np.testing.assert_allclose(np.sort(vals), np.sort(exact),
                                   rtol=1e-8)

    def test_shift_invert(self):
        n = 150
        ab = _lap_band(n)
        vals, vecs = banded.eigsh_banded(ab, 1, 1, k=3, sigma=0.0,
                                         which="LM", tol=1e-10,
                                         dtype=np.float64)
        exact = 2 - 2 * np.cos(np.pi * np.arange(1, 4) / (n + 1))
        np.testing.assert_allclose(np.sort(vals), exact, rtol=1e-8)

    def test_generalized_banded(self, rng):
        n = 100
        ab, a = _penta_band(n, rng)
        mb = np.zeros((5, n))
        mb[2, :] = 4.0 / 6
        mb[1, 1:] = 1.0 / 6
        mb[3, :-1] = 1.0 / 6
        m = sp.diags([np.full(n - 1, 1 / 6), np.full(n, 4 / 6),
                      np.full(n - 1, 1 / 6)], [-1, 0, 1]).tocsr()
        vals, vecs = banded.eigsh_banded(ab, 2, 2, k=3, mb=mb, sigma=1.0,
                                         which="LM", tol=1e-9,
                                         dtype=np.float64)
        w = sla_d.eigh(a.toarray(), m.toarray(), eigvals_only=True)
        close = w[np.argsort(np.abs(w - 1.0))][:3]
        np.testing.assert_allclose(np.sort(vals), np.sort(close), rtol=1e-7)
        assert residual(a, vals, vecs, m).max() < 1e-7


class TestBandedEigs:
    def test_nonsym_banded(self):
        n = 120
        h = 1.0 / (n + 1)
        c = 20.0 * h / 2
        ab = np.zeros((3, n))
        ab[0, 1:] = -1.0 + c
        ab[1, :] = 2.0
        ab[2, :-1] = -1.0 - c
        a = sp.diags([(-1 - c) * np.ones(n - 1), 2 * np.ones(n),
                      (-1 + c) * np.ones(n - 1)], [-1, 0, 1]).tocsr()
        vals, vecs = banded.eigs_banded(ab, 1, 1, k=4, which="LM",
                                        tol=1e-10, dtype=np.float64)
        assert residual(a, vals, vecs).max() < 1e-8
