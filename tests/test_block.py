"""Thick-restart block Lanczos (core/block.py) — the nb>1 extension the
reference fixes at nb=1 (SRC/dsaupd.f:160)."""
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
