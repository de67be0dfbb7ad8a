"""ILU(0)/IC(0) preconditioning (arpackmm's --slvItrPC ILU,
arpackmm.cpp:445-476) and the generalized+iterative CLI path.

The device application replaces triangular solves with fixed-sweep
truncated Neumann series over DIA-streamed strict triangles (no gathers);
these tests pin (a) application quality equal to the exact
triangular-solve ILU(0), (b) genuine Krylov acceleration, (c) the
safety fallbacks (pivoting needed / indefinite amplification), and
(d) the arpackmm-parity CLI combinations that round-1 rejected
("iterative generalized solves: use --slv LU").
"""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from arpack_ng_tpu.ops import solvers as slv
from arpack_ng_tpu.ops.sparse import from_scipy


def _lap2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(np.float64)


class TestILU0:
    def test_matches_exact_triangular_solve_quality(self, rng):
        A = _lap2d(40)
        n = A.shape[0]
        r = rng.standard_normal(n)
        ilu = spla.spilu(A.tocsc(), drop_tol=0.0, fill_factor=1.0,
                         permc_spec="NATURAL", diag_pivot_thresh=0.0)
        q_exact = np.linalg.norm(r - A @ ilu.solve(r)) / np.linalg.norm(r)
        pc = slv.ilu0_preconditioner(A, sweeps=4)
        z = np.asarray(pc(jnp.asarray(r)))
        q_trunc = np.linalg.norm(r - A @ z) / np.linalg.norm(r)
        # truncated Neumann sweeps reproduce the exact ILU application
        assert abs(q_trunc - q_exact) < 0.02

    def test_accelerates_bicgstab(self, rng):
        A = _lap2d(40)
        n = A.shape[0]
        r = rng.standard_normal(n)
        amv = from_scipy(A, format="dia", n_pad=n).a_apply
        pc = slv.ilu0_preconditioner(A, sweeps=3)
        x_pc = np.asarray(slv.bicgstab(amv, jnp.asarray(r), tol=1e-14,
                                       maxiter=20, precond=pc))
        x_no = np.asarray(slv.bicgstab(amv, jnp.asarray(r), tol=1e-14,
                                       maxiter=20))
        res_pc = np.linalg.norm(A @ x_pc - r)
        res_no = np.linalg.norm(A @ x_no - r)
        assert res_pc < 0.6 * res_no       # measured ~2.7x

    def test_symmetric_variant_accelerates_cg(self, rng):
        A = _lap2d(40)
        n = A.shape[0]
        r = rng.standard_normal(n)
        amv = from_scipy(A, format="dia", n_pad=n).a_apply
        pc = slv.ilu0_preconditioner(A, sweeps=3, symmetric=True)
        x_pc = np.asarray(slv.cg(amv, jnp.asarray(r), tol=1e-14,
                                 maxiter=30, precond=pc))
        x_no = np.asarray(slv.cg(amv, jnp.asarray(r), tol=1e-14,
                                 maxiter=30))
        assert (np.linalg.norm(A @ x_pc - r)
                < 0.7 * np.linalg.norm(A @ x_no - r))

    def test_indefinite_amplification_falls_back(self, rng):
        # ILU(0) of an interior-shifted pencil amplifies (measured probe
        # ~11x): the builder must warn and return Jacobi instead
        n = 300
        T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
        M = sp.diags([1 / 6, 4 / 6, 1 / 6], [-1, 0, 1], shape=(n, n))
        S = (T - 0.5 * M).tocsr()
        with pytest.warns(UserWarning, match="quality probe"):
            pc = slv.ilu0_preconditioner(S)
        # the fallback is diagonal: application must be elementwise
        r = rng.standard_normal(n)
        z = np.asarray(pc(jnp.asarray(r)))
        assert np.allclose(z, r / S.diagonal())

    def test_zero_diagonal_falls_back(self):
        A = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))
        with pytest.warns(UserWarning):
            pc = slv.ilu0_preconditioner(A)
        assert pc is not None


@pytest.fixture(scope="module")
def mtx_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mtx")
    n = 300
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    M = sp.diags([1 / 6, 4 / 6, 1 / 6], [-1, 0, 1], shape=(n, n)).tocsr()
    pa, pm = str(d / "A.mtx"), str(d / "M.mtx")
    sio.mmwrite(pa, T)
    sio.mmwrite(pm, M)
    return pa, pm


def _run_cli(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "arpack_ng_tpu.cli",
                        "--cpu", "--json"] + args,
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    return r


class TestCLIGeneralizedIterative:
    """arpackmm handles generalized + iterative (round-1 rejected it)."""

    def test_mode2_cg(self, mtx_files):
        pa, pm = mtx_files
        r = _run_cli(["--A", pa, "--B", pm, "--genPb", "--nbEV", "3",
                      "--mag", "LM", "--slv", "CG", "--tol", "1e-8",
                      "--maxIt", "600"])
        assert r.returncode == 0, r.stderr[-500:]
        out = json.loads(r.stdout)
        assert out["nconv"] >= 3
        assert max(out["residuals"]) < 1e-6
        assert max(out["values_real"]) == pytest.approx(11.999, abs=1e-2)

    def test_mode3_shift_invert_cg_ilu(self, mtx_files):
        pa, pm = mtx_files
        r = _run_cli(["--A", pa, "--B", pm, "--genPb", "--shiftReal",
                      "-1.0", "--invert", "--nbEV", "3", "--slv", "CG",
                      "--slvItrPC", "ILU", "--tol", "1e-8",
                      "--maxIt", "300"])
        assert r.returncode == 0, r.stderr[-500:]
        out = json.loads(r.stdout)
        assert max(out["residuals"]) < 1e-6

    def test_mode3_interior_shift_bicg(self, mtx_files):
        pa, pm = mtx_files
        r = _run_cli(["--A", pa, "--B", pm, "--genPb", "--shiftReal",
                      "0.5", "--invert", "--nbEV", "3", "--slv", "BiCG",
                      "--slvItrPC", "Diag", "--tol", "1e-8",
                      "--maxIt", "300", "--slvMaxIt", "8000"])
        assert r.returncode == 0, r.stderr[-500:]
        out = json.loads(r.stdout)
        assert max(out["residuals"]) < 1e-6
        for v in out["values_real"]:
            assert abs(v - 0.5) < 0.05     # interior cluster around sigma

    def test_complex_shift_iterative_rejected(self, mtx_files):
        pa, pm = mtx_files
        r = _run_cli(["--A", pa, "--nonSymPb", "--shiftImag", "0.5",
                      "--invert", "--nbEV", "2", "--slv", "BiCG"])
        assert r.returncode != 0
        assert "complex shift" in r.stderr
