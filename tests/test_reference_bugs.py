"""Remaining reference regression behaviors (TESTS/ tier) + the CLI sweep
over the reference's SHIPPED MatrixMarket matrices.

* bug_1315 (TESTS/bug_1315_single.c): single-precision non-symmetric
  solve of diag(1..1000), nev=9 LM, default tol — historically stagnated
  in snaupd; must converge to 992..1000 at f32 accuracy.
* bug_58 (TESTS/bug_58_double.f): 9x9 modified SINGULAR identity
  (a[0,0]=0, a[0,8]=1), shift-invert sigma=-1 — dneupd's purification
  historically produced NaN eigenvector columns; vectors must be finite
  with small residuals.
* bug_79 (TESTS/bug_79_double_complex.f): the starting vector must be
  used as given / lie in the range of OP — seeding with an exact
  eigenvector must converge (nearly) immediately, proving v0 enters the
  Krylov space unmangled.
* arpackmm.sh-class sweep over /root/reference/EXAMPLES/MATRIX_MARKET/
  {As,An,Az,B,Bz,issue215,issue401}.mtx — the reference's own shipped
  matrices in its own (non-standard, leniently parsed) format, including
  the issue215 zero-matrix shift and the issue401 dump/restart protocol.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import arpack_ng_tpu as at

from conftest import residual

REF_MM = Path("/root/reference/EXAMPLES/MATRIX_MARKET")
needs_ref = pytest.mark.skipif(not REF_MM.exists(),
                               reason="reference tree not present")


class TestBug1315SinglePrecision:
    def test_f32_nonsym_diag_converges(self):
        n = 1000
        d = np.arange(1.0, n + 1, dtype=np.float32)
        op = at.from_diagonal(d, n_pad=at.pad_dim(n))
        # the bug scenario: nonsym driver, f32, nev=9, ncv=2*nev+1,
        # tol=0 -> f32 machine eps default (TESTS/bug_1315_single.c:23-56)
        vals, vecs = at.eigs(op, k=9, which="LM", ncv=19, tol=0.0,
                             maxiter=10 * n)
        got = np.sort(vals.real)
        np.testing.assert_allclose(got, np.arange(992.0, 1001.0),
                                   rtol=2e-5)
        assert residual(np.diag(d.astype(np.float64)), vals, vecs).max() \
            < 1e-3


class TestBug58PurificationNaN:
    def test_singular_shift_invert_no_nans(self):
        # 9x9: identity with a(0,0)=0, a(0,8)=1 — SINGULAR (lambda=0 is an
        # eigenvalue); shift-invert about sigma=-1, nev=4, ncv=8
        # (TESTS/bug_58_double.f header: NaN column from dneupd
        # purification)
        n = 9
        a = np.eye(n)
        a[0, 0] = 0.0
        a[0, n - 1] = 1.0
        vals, vecs = at.eigs(a, k=4, sigma=-1.0, which="LM", tol=1e-12,
                             maxiter=300)
        assert np.all(np.isfinite(vecs.real)) and \
            np.all(np.isfinite(vecs.imag if np.iscomplexobj(vecs)
                               else vecs))
        assert np.all(np.isfinite(vals.real))
        assert residual(a, vals, vecs).max() < 1e-8
        # the singular eigenvalue 0 is among the closest-to-sigma set
        assert np.min(np.abs(vals)) < 1e-8


class TestBug79StartVectorInRangeOfOp:
    def _conv_diff(self, nx=10, rho=100.0):
        # zndrv1's complex convection-diffusion block operator
        import scipy.sparse as sp
        h = 1.0 / (nx + 1)
        dd, dl, du = 4.0 / h, -1.0 / h - rho / 2.0, -1.0 / h + rho / 2.0
        T = sp.diags([dl, dd, du], [-1, 0, 1], shape=(nx, nx))
        I = sp.eye(nx)
        A = (sp.kron(I, T) + sp.kron(sp.diags([-1.0 / h, -1.0 / h],
                                              [-1, 1], shape=(nx, nx)),
                                     I)).tocsr()
        return A.astype(np.complex128)

    def test_v0_used_as_given(self):
        a = self._conv_diff().toarray()
        w, v = np.linalg.eig(a)
        j = np.argmax(np.abs(w))
        # seed with the exact dominant eigenvector: convergence must be
        # (nearly) immediate — proof the start vector is not replaced
        vals, vecs, out = at.eigs(a, k=1, which="LM", tol=1e-10,
                                  v0=v[:, j], maxiter=50,
                                  return_stats=True)
        assert np.abs(vals[0] - w[j]) < 1e-8 * abs(w[j])
        assert out.stats.n_iter <= 2

    def test_all_ones_v0_converges(self):
        a = self._conv_diff().toarray()
        vals, vecs = at.eigs(a, k=4, which="LM", tol=1e-10,
                             v0=np.ones(a.shape[0], np.complex128),
                             maxiter=500)
        assert residual(a, vals, vecs).max() < 1e-8


def _run_cli(args, timeout=300):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "arpack_ng_tpu.cli", "--cpu", "--json"]
        + args, capture_output=True, text=True, env=env, timeout=timeout,
        cwd=str(Path(__file__).resolve().parent.parent))


@needs_ref
class TestReferenceMatrixSweep:
    """arpackmm.sh over the reference's own shipped .mtx files."""

    @pytest.mark.parametrize("args", [
        ["--A", str(REF_MM / "As.mtx"), "--nbEV", "2", "--mag", "LM"],
        ["--A", str(REF_MM / "As.mtx"), "--nbEV", "2", "--mag", "SM",
         "--maxIt", "2000"],
        ["--A", str(REF_MM / "As.mtx"), "--nbEV", "2", "--shiftReal",
         "150.0", "--invert"],
        ["--A", str(REF_MM / "An.mtx"), "--nonSymPb", "--nbEV", "2",
         "--mag", "LM"],
        ["--A", str(REF_MM / "An.mtx"), "--nonSymPb", "--nbEV", "2",
         "--shiftReal", "150.0", "--invert"],
        ["--A", str(REF_MM / "As.mtx"), "--B", str(REF_MM / "B.mtx"),
         "--genPb", "--nbEV", "2", "--mag", "LM"],
        ["--A", str(REF_MM / "Az.mtx"), "--cpxPb", "--nonSymPb",
         "--nbEV", "2", "--mag", "LM"],
        ["--A", str(REF_MM / "Az.mtx"), "--B", str(REF_MM / "Bz.mtx"),
         "--cpxPb", "--nonSymPb", "--genPb", "--nbEV", "2",
         "--mag", "LM"],
        ["--A", str(REF_MM / "An.mtx"), "--nonSymPb", "--nbEV", "2",
         "--mag", "LM", "--schur"],
    ])
    def test_combo(self, args):
        r = _run_cli(args + ["--tol", "1e-8"])
        assert r.returncode == 0, (r.stdout + r.stderr)[-1200:]
        out = json.loads(r.stdout)
        assert out["nconv"] >= 2
        if out["residuals"]:
            assert max(out["residuals"]) < 1e-5

    def test_issue215_zero_matrix_shift(self):
        # 4x4 all-zero matrix, shift-invert about 0.1
        # (issue215.sh: --mag LM --nbEV 1 --nbCV 4 --shiftReal 0.1)
        r = _run_cli(["--A", str(REF_MM / "issue215.mtx"), "--nbEV", "1",
                      "--nbCV", "4", "--mag", "LM", "--shiftReal", "0.1",
                      "--invert", "--tol", "1e-10"])
        assert r.returncode == 0, (r.stdout + r.stderr)[-1200:]
        out = json.loads(r.stdout)
        assert abs(out["values_real"][0]) < 1e-10     # spectrum is {0}

    def test_issue401_restart_protocol(self, tmp_path):
        # issue401.sh: solve, then solve again restarting from the dump
        ck = str(tmp_path / "issue401.ck.npz")
        r1 = _run_cli(["--A", str(REF_MM / "issue401.mtx"), "--nbEV", "1",
                       "--nbCV", "5", "--mag", "LA", "--tol", "1e-10",
                       "--dump", ck])
        assert r1.returncode == 0, (r1.stdout + r1.stderr)[-1200:]
        r2 = _run_cli(["--A", str(REF_MM / "issue401.mtx"), "--nbEV", "1",
                       "--nbCV", "5", "--mag", "LA", "--tol", "1e-10",
                       "--restart", ck])
        assert r2.returncode == 0, (r2.stdout + r2.stderr)[-1200:]
        v1 = json.loads(r1.stdout)["values_real"][0]
        v2 = json.loads(r2.stdout)["values_real"][0]
        assert v1 == pytest.approx(1.0, abs=1e-8)     # spectrum {1,-1,0..}
        assert v2 == pytest.approx(v1, abs=1e-8)
