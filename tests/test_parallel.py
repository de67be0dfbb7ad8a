"""Distributed (row-partitioned) solve tests on an 8-device virtual CPU
mesh — the analog of PARPACK's mpiexec -n 2 test tier
(PARPACK/TESTS/MPI/icb_parpack_c.c, CMakeLists.txt:786-792).

Key invariant (reference: distributed solve returns the same eigenpairs as
sequential, PARPACK examples check residuals the same way): results must be
shard-count-invariant within tolerance."""
import jax
import numpy as np
import pytest

import arpack_ng_tpu as at
from arpack_ng_tpu import models
from arpack_ng_tpu.parallel.sharding import make_mesh, state_shardings

from conftest import residual


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return make_mesh(8)


class TestDistributedEigsh:
    def test_diagonal_8dev(self, mesh8):
        n = 1000
        d = np.arange(1, n + 1, dtype=np.float64)
        op = at.from_diagonal(d, n_pad=at.pad_dim(n))
        vals, vecs = at.eigsh(op, k=4, which="LM", tol=1e-10, maxiter=500,
                              mesh=mesh8)
        np.testing.assert_allclose(vals, [997.0, 998.0, 999.0, 1000.0],
                                   rtol=1e-9)

    def test_matches_single_device(self, mesh8):
        n = 600
        rng = np.random.default_rng(7)
        d = np.sort(rng.uniform(1.0, 100.0, n))
        op = at.from_diagonal(d, n_pad=at.pad_dim(n))
        v0 = rng.standard_normal(n)
        kwargs = dict(k=5, which="LA", tol=1e-10, maxiter=800, v0=v0)
        vals_seq = at.eigsh(op, return_eigenvectors=False, **kwargs)
        vals_dist = at.eigsh(op, return_eigenvectors=False, mesh=mesh8,
                             **kwargs)
        # shard-count invariance (within roundoff: psum order differs from
        # sequential summation)
        np.testing.assert_allclose(vals_dist, vals_seq, rtol=1e-10)

    def test_stencil_laplacian_dist(self, mesh8):
        # stencil operator under GSPMD: reshape/pad lower to collectives
        nx = 16
        op, a_sp = models.laplacian_2d(nx, dtype=np.float64)
        vals, vecs = at.eigsh(op, k=4, which="LA", ncv=20, tol=1e-9,
                              maxiter=500, mesh=mesh8)
        assert residual(a_sp, vals, vecs).max() < 1e-8

    def test_nonsym_dist(self, mesh8):
        nx = 12
        op, a_sp = models.convection_diffusion_2d(nx, rho=50.0,
                                                  dtype=np.float64)
        vals, vecs = at.eigs(op, k=4, which="LM", ncv=20, tol=1e-9,
                             maxiter=800, mesh=mesh8)
        assert residual(a_sp, vals, vecs).max() < 1e-7

    def test_fused_real_dist_matches_single(self, mesh8):
        """The fused real-nonsym whole-loop-on-device path under
        PARPACK-style shardings: same eigenvalues as single-device."""
        nx = 12
        op, a_sp = models.convection_diffusion_2d(nx, rho=50.0,
                                                  dtype=np.float64)
        kw = dict(k=4, which="LM", ncv=20, tol=1e-9, maxiter=800,
                  strategy="fused_real")
        vals_m, vecs_m = at.eigs(op, mesh=mesh8, **kw)
        vals_1, _ = at.eigs(op, **kw)
        np.testing.assert_allclose(np.sort_complex(vals_m),
                                   np.sort_complex(vals_1), rtol=1e-7)
        assert residual(a_sp, vals_m, vecs_m).max() < 1e-7


class TestShardingLayout:
    def test_state_is_sharded(self, mesh8):
        from arpack_ng_tpu.config import IRAMConfig
        from arpack_ng_tpu.core.iram import IRAMSolver
        n = 1024
        d = np.linspace(1, 2, n)
        op = at.from_diagonal(d, n_pad=1024)
        cfg = IRAMConfig(n=n, nev=3, ncv=10, which="LA", symmetric=True,
                         dtype=np.float64, n_pad=1024)
        s = IRAMSolver(op, cfg, mesh=mesh8)
        st = s.init_state()
        # V must actually be row-sharded over the mesh, resid too
        # (panel axis in the 3-D per-row-tiled layout, arnoldi.v_is_3d)
        from arpack_ng_tpu.core.arnoldi import v_is_3d
        v_shard = st.V.sharding
        expect = state_shardings(mesh8, v3d=v_is_3d(cfg, mesh8)).V
        assert v_shard.spec == expect.spec
        assert "rows" in v_shard.spec
        assert len(st.resid.sharding.device_set) == 8
        # H replicated
        assert st.H.sharding.is_fully_replicated


class TestHaloOperator:
    """Explicit halo-exchange stencil (the pdsdrv1 mpi_send/recv pattern
    as shard_map + ppermute, PARPACK/EXAMPLES/MPI/pdsdrv1.f:429-480)."""

    def test_halo_matvec_matches_sparse(self, mesh8):
        import jax.numpy as jnp
        from arpack_ng_tpu.models.distributed import laplacian_2d_sharded
        from arpack_ng_tpu.parallel.sharding import row_sharding
        nx, ny = 128, 32
        op, a_sp = laplacian_2d_sharded(nx, ny, mesh8, dtype=np.float64)
        x = np.random.default_rng(0).standard_normal(nx * ny)
        xd = jax.device_put(jnp.asarray(x), row_sharding(mesh8))
        y = np.asarray(op.a_apply(xd))
        np.testing.assert_allclose(y, a_sp @ x, atol=1e-12)

    def test_halo_eigensolve(self, mesh8):
        from arpack_ng_tpu.models.distributed import laplacian_2d_sharded
        nx, ny = 128, 32
        op, a_sp = laplacian_2d_sharded(nx, ny, mesh8, dtype=np.float64)
        vals, vecs = at.eigsh(op, k=3, which="LA", tol=1e-9, maxiter=400,
                              mesh=mesh8)
        assert residual(a_sp, vals, vecs).max() < 1e-8


class TestCommModel:
    """Pin the COMMUNICATION MODEL: XLA must insert O(1) collectives per
    Lanczos step at the reference's algebraic sites — PARPACK's analysis
    is one allreduce of the CGS coefficient vector plus scalar norm
    allreduces per step (PARPACK/SRC/MPI/pdsaitr.f:575-610; SURVEY §3.3
    'comm volume is tiny, latency-bound').  A layout regression that
    made XLA all-gather the row-sharded basis instead would explode
    collective COUNT or move to all-gather-dominated comm — this test
    catches both by inspecting the compiled HLO."""

    def test_extend_collectives_bounded(self, mesh8):
        import re
        from arpack_ng_tpu.config import IRAMConfig
        from arpack_ng_tpu.core.arnoldi import (make_extend, make_init,
                                                v_is_3d)
        from arpack_ng_tpu.parallel.sharding import (replicated,
                                                     state_shardings)
        import jax.numpy as jnp

        op, _ = models.laplacian_2d(32, dtype=np.float64)
        cfg = IRAMConfig(n=op.n, nev=4, ncv=16, which="LA",
                         symmetric=True, dtype=np.dtype(np.float64),
                         n_pad=op.n_pad, tol=1e-8, max_iter=50,
                         reorth="dgks")
        init = make_init(op, cfg, v3d=v_is_3d(cfg, mesh8))
        extend = make_extend(op, cfg)
        st_sh = state_shardings(mesh8, v3d=v_is_3d(cfg, mesh8))
        rep = replicated(mesh8)
        st = jax.jit(lambda k: init(k, None), in_shardings=(rep,),
                     out_shardings=st_sh)(jax.random.key(0))
        fn = jax.jit(lambda s: extend(s, jnp.int32(cfg.ncv)),
                     in_shardings=(st_sh,), out_shardings=st_sh)
        hlo = fn.lower(st).compile().as_text()
        n_ar = len(re.findall(r"all-reduce", hlo))
        n_ag = len(re.findall(r"all-gather", hlo))
        # the ncv-step extension contains a DGKS while_loop; the
        # all-reduce count must stay O(1) per algebraic site (CGS
        # coeffs, wnorm, rnorm, refinement), NOT O(ncv) unrolled and
        # NOT replaced by basis-sized all-gathers
        assert n_ar >= 1, "no all-reduces: solve is not actually sharded"
        assert n_ar <= 40, f"collective explosion: {n_ar} all-reduces"
        assert n_ag <= n_ar, (
            f"all-gather-dominated comm ({n_ag} vs {n_ar}): the basis "
            "is being gathered instead of reduced")
