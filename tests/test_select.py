"""howmny='S' select-mask semantics (SRC/dseupd.f:62-66, dneupd.f:60-66).

The reference documents SELECT(j) <-> Ritz value D(j) but returns
info=-16/-12 'not yet implemented'; this framework implements the
documented contract: the mask is positional over the ncv Ritz values of
the final factorization (``IRAMResult.ritz``, the aupd exit ordering),
only converged entries yield vectors, and complex-conjugate partners are
auto-completed in real arithmetic.
"""
import numpy as np
import pytest

import arpack_ng_tpu as at
from arpack_ng_tpu.config import IRAMConfig
from arpack_ng_tpu.core.extract import extract
from arpack_ng_tpu.core.iram import IRAMSolver
from arpack_ng_tpu.ops import operator as op_mod

from conftest import residual


def _sym_problem(n=120, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.linspace(1.0, n, n)
    a = (q * vals) @ q.T
    a = (a + a.T) / 2
    return a


class TestSelectSymmetric:
    def test_select_subset_of_converged(self):
        a = _sym_problem()
        op = op_mod.from_dense(a, hermitian=True)
        cfg = IRAMConfig(n=op.n, nev=6, ncv=20, which="LA", symmetric=True,
                         dtype=op.dtype, n_pad=op.n_pad, tol=1e-10,
                         max_iter=500)
        solver = IRAMSolver(op, cfg)
        res = solver.solve()
        assert res.nconv >= 6
        # pick Ritz values #1 and #3 of the exit ordering
        select = np.zeros(cfg.ncv, bool)
        select[1] = select[3] = True
        out = extract(op, cfg, res, rvec=True, howmny="S", select=select)
        assert out.nconv == 2
        expect = np.sort(np.asarray(res.ritz)[[1, 3]])
        assert np.allclose(np.sort(out.values), expect, rtol=1e-8)
        assert residual(a, out.values, out.vectors).max() < 1e-8

    def test_select_unconverged_dropped(self):
        a = _sym_problem()
        op = op_mod.from_dense(a, hermitian=True)
        cfg = IRAMConfig(n=op.n, nev=4, ncv=12, which="LA", symmetric=True,
                         dtype=op.dtype, n_pad=op.n_pad, tol=1e-10,
                         max_iter=500)
        solver = IRAMSolver(op, cfg)
        res = solver.solve()
        # select everything: only converged Ritz values may come back
        select = np.ones(cfg.ncv, bool)
        out = extract(op, cfg, res, rvec=True, howmny="S", select=select)
        assert out.nconv <= cfg.ncv
        assert residual(a, out.values, out.vectors).max() < 1e-6

    def test_select_requires_mask_and_length(self):
        a = _sym_problem(40)
        op = op_mod.from_dense(a, hermitian=True)
        cfg = IRAMConfig(n=op.n, nev=3, ncv=10, which="LA", symmetric=True,
                         dtype=op.dtype, n_pad=op.n_pad, tol=1e-8,
                         max_iter=300)
        res = IRAMSolver(op, cfg).solve()
        with pytest.raises(ValueError, match="select"):
            extract(op, cfg, res, howmny="S", select=None)
        with pytest.raises(ValueError, match="length ncv"):
            extract(op, cfg, res, howmny="S", select=np.ones(3, bool))

    def test_api_level_select(self):
        a = _sym_problem()
        vals, vecs = at.eigsh(a, k=6, which="LA", ncv=20, tol=1e-10,
                              select=np.array([True] * 2 + [False] * 18))
        assert len(vals) <= 2
        assert residual(a, vals, vecs).max() < 1e-8


class TestSelectNonsym:
    def test_conjugate_pair_completion(self):
        # real matrix with genuinely complex spectrum: selecting one member
        # of a pair must bring its partner (real packed storage needs both)
        rng = np.random.default_rng(5)
        n = 80
        a = rng.standard_normal((n, n)) * 0.3 + np.diag(np.arange(1.0, n + 1))
        a[1, 0] += 8.0
        a[0, 1] -= 8.0          # strong rotation block -> complex pair
        op = op_mod.from_dense(a, hermitian=False)
        cfg = IRAMConfig(n=op.n, nev=6, ncv=24, which="LI", symmetric=False,
                         dtype=op.dtype, n_pad=op.n_pad, tol=1e-10,
                         max_iter=800)
        res = IRAMSolver(op, cfg).solve()
        ritz = np.asarray(res.ritz)
        cplx = [j for j in range(len(ritz)) if ritz[j].imag > 1e-8][:1]
        if not cplx:
            pytest.skip("no complex Ritz value converged")
        select = np.zeros(cfg.ncv, bool)
        select[cplx[0]] = True
        out = extract(op, cfg, res, rvec=True, howmny="S", select=select)
        assert out.nconv == 2           # partner auto-completed
        assert np.allclose(np.sort(out.values.imag),
                           np.sort([-out.values[0].imag,
                                    out.values[0].imag]))
        assert residual(a, out.values, out.vectors).max() < 1e-7
