"""Thick-restart block Lanczos (core/block.py) — the nb>1 extension the
reference fixes at nb=1 (SRC/dsaupd.f:160)."""
import jax.numpy as jnp
import numpy as np
import pytest

import arpack_ng_tpu as at
from arpack_ng_tpu import models
from arpack_ng_tpu.core.block import eigsh_block


class TestBlockLanczos:
    @pytest.mark.parametrize("b", [1, 2, 4])
    def test_matches_scalar_solver(self, b):
        op, a = models.laplacian_2d(40, dtype=np.float64)  # n = 1600
        ref = np.sort(np.asarray(at.eigsh(op, k=6, which="LA", tol=1e-10,
                                          return_eigenvectors=False)))
        vals, vecs, info = eigsh_block(op, k=6, block_size=b, ncv=32,
                                       tol=1e-10, maxiter=400,
                                       dtype=np.float64)
        assert info["nconv"] >= 6
        np.testing.assert_allclose(np.sort(vals), ref, rtol=1e-10)
        for i in range(6):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-8

    def test_resolves_multiplet_in_one_sweep(self):
        """A multiplicity-3 eigenvalue: block size >= multiplicity
        captures every copy (scalar Lanczos provably cannot separate
        copies from one starting vector)."""
        d = np.concatenate([np.full(3, 50.0), np.linspace(1, 40, 197)])
        op = at.from_diagonal(d, n_pad=at.pad_dim(200))
        vals, vecs, info = eigsh_block(op, k=4, block_size=4, ncv=24,
                                       tol=1e-10, maxiter=200,
                                       dtype=np.float64)
        assert info["nconv"] >= 4
        # degenerate-multiplet convention (CLAUDE.md): assert the
        # multiplicity captured + residuals, never the exact value set
        assert np.sum(np.abs(vals - 50.0) < 1e-8) >= 3
        a = np.diag(d)
        for i in range(4):
            r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
            assert r < 1e-8

    def test_rejects_unsupported(self):
        from arpack_ng_tpu.core.block import make_block_solver
        op, _ = models.laplacian_2d(8, dtype=np.float64)
        with pytest.raises(ValueError, match="multiple"):
            make_block_solver(op, 3, 2, 16, np.float64)  # ncv % b != 0
        with pytest.raises(ValueError, match="real-only"):
            eigsh_block(op, k=2, block_size=2, ncv=16,
                        dtype=np.complex128)


class TestLaneMajorBlockApply:
    """Tile-interleaved block DIA matvec (ops/sparse.dia_block_matvec_fn,
    round-4 verdict #8 layout fix) vs scipy, incl. offsets > 128 and
    padded dimensions."""

    @pytest.mark.parametrize("b", [1, 2, 4])
    def test_matches_scipy(self, b):
        import scipy.sparse as sp
        from arpack_ng_tpu.config import pad_dim
        from arpack_ng_tpu.ops.sparse import (_to_dia,
                                              dia_block_matvec_fn)
        rng = np.random.default_rng(b)
        n = 1000
        n_pad = pad_dim(n)
        offs = [0, 1, -1, 7, -7, 130, -130, 300, -300]
        a = sp.diags([rng.standard_normal(n - abs(o)) for o in offs],
                     offs, shape=(n, n)).tocsr()
        offsets, diags = _to_dia(a)
        blk = dia_block_matvec_fn(offsets, diags, n, n_pad)
        X = rng.standard_normal((b, n_pad))
        X[:, n:] = 0.0
        Y = np.asarray(blk(jnp.asarray(X)))
        for j in range(b):
            np.testing.assert_allclose(Y[j, :n], a @ X[j, :n],
                                       rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(Y[:, n:], 0.0, atol=1e-300)

    def test_from_scipy_dia_carries_block_apply(self):
        import scipy.sparse as sp
        from arpack_ng_tpu.ops.sparse import from_scipy
        n = 3000   # above DENSE_MAX_N so auto picks 'dia'
        a = sp.diags([np.ones(n - 1), 2 * np.ones(n), np.ones(n - 1)],
                     [-1, 0, 1]).tocsr()
        op = from_scipy(a, hermitian=True)
        assert op.format == "dia" and op.apply_block is not None
        X = np.random.default_rng(0).standard_normal((2, op.n_pad))
        X[:, n:] = 0
        Y = np.asarray(op.apply_block(jnp.asarray(X)))
        for j in range(2):
            np.testing.assert_allclose(Y[j, :n], a @ X[j, :n],
                                       rtol=1e-12)
