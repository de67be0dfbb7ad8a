"""Structure-exploiting sparse import tests: auto format selection
(dense / DIA / RCM+DIA / ELL), permutation transparency."""
import numpy as np
import pytest
import scipy.sparse as sp

import arpack_ng_tpu as at
from arpack_ng_tpu.ops.sparse import (dia_matvec_fn, from_scipy,
                                      structural_diagonals)

from conftest import residual


def _lap2d(nx):
    t = sp.diags([-np.ones(nx - 1), 2 * np.ones(nx), -np.ones(nx - 1)],
                 [-1, 0, 1])
    eye = sp.identity(nx)
    return (sp.kron(eye, t) + sp.kron(t, eye)).tocsr().astype(np.float64)


class TestAutoFormat:
    def test_small_goes_dense(self):
        a = _lap2d(10)  # n=100 <= DENSE_MAX_N
        op = from_scipy(a, hermitian=True)
        assert op.perm is None
        vals, vecs = at.eigsh(op, k=3, which="LA", tol=1e-10)
        assert residual(a, vals, vecs).max() < 1e-8

    def test_structured_goes_dia(self):
        a = _lap2d(60)  # n=3600, 5 diagonals
        op = from_scipy(a, hermitian=True)
        assert op.perm is None
        x = np.random.default_rng(0).standard_normal(op.n_pad)
        x[a.shape[0]:] = 0
        import jax.numpy as jnp
        y = np.asarray(op.a_apply(jnp.asarray(x)))
        np.testing.assert_allclose(y[: a.shape[0]], a @ x[: a.shape[0]],
                                   rtol=1e-12)

    def test_scrambled_goes_rcm_dia(self):
        nx = 60
        a = _lap2d(nx)
        n = nx * nx
        rng = np.random.default_rng(0)
        p = rng.permutation(n)
        a_s = a[p][:, p].tocsr()
        assert structural_diagonals(a_s) > 1000
        op = from_scipy(a_s, hermitian=True)
        assert op.perm is not None
        vals, vecs = at.eigsh(op, k=4, which="LA", tol=1e-10, maxiter=500)
        # residuals verified against the ORIGINAL (scrambled) matrix:
        # the internal RCM permutation must be invisible
        assert residual(a_s, vals, vecs).max() < 1e-8

    def test_v0_with_permutation(self):
        nx = 60
        a = _lap2d(nx)
        n = nx * nx
        p = np.random.default_rng(1).permutation(n)
        a_s = a[p][:, p].tocsr()
        op = from_scipy(a_s, hermitian=True)
        assert op.perm is not None
        v0 = np.random.default_rng(2).standard_normal(n)
        r1 = at.eigsh(op, k=3, which="LA", tol=1e-10, v0=v0,
                      return_eigenvectors=False)
        r2 = at.eigsh(op, k=3, which="LA", tol=1e-10, v0=v0,
                      return_eigenvectors=False)
        np.testing.assert_array_equal(r1, r2)

    def test_dia_matvec_arbitrary_offsets(self):
        n = 300
        offs = [-7, -1, 0, 2, 11]
        rng = np.random.default_rng(3)
        diags = [rng.standard_normal(n) for _ in offs]
        mats = []
        for o, dvals in zip(offs, diags):
            m = n - abs(o)
            if o >= 0:
                mats.append(sp.diags(dvals[:m], o, shape=(n, n)))
            else:
                mats.append(sp.diags(dvals[-o:][:m], o, shape=(n, n)))
        a = sum(mats).tocsr()
        import jax.numpy as jnp
        mv = dia_matvec_fn(offs, diags, n, 384)
        x = np.zeros(384)
        x[:n] = rng.standard_normal(n)
        y = np.asarray(mv(jnp.asarray(x)))
        np.testing.assert_allclose(y[:n], a @ x[:n], rtol=1e-11,
                                   atol=1e-12)
