"""Benchmark: flagship symmetric eigensolve throughput on one chip.

Workload: dssimp-class 2-D Dirichlet Laplacian (5-point stencil), n = nx^2,
float32, ncv-step Lanczos cycles of the IRAM solver — the reference's
dominant cost profile (per restart cycle: np matvecs + O(n*ncv) CGS,
SRC/dsaupd.f:139-145).

Metric: sustained operator-application throughput through the *whole*
solver (matvec + orthogonalization + basis updates), reported as nnz/s
(stencil nnz ~= 5n), plus wall-clock per restart cycle on stderr.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}
The reference publishes no performance numbers (BASELINE.md), so
vs_baseline is the ratio against a fixed roofline estimate: stencil SpMV at
HBM bandwidth (v5e ~819 GB/s -> bound = BW/8 bytes-per-point nnz/s scaled
by arithmetic intensity of the 5-point stencil).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from arpack_ng_tpu import models
    from arpack_ng_tpu.config import IRAMConfig
    from arpack_ng_tpu.core.device_sym import FusedSymSolver

    nx = 1024                      # n = 1,048,576
    ncv, nev = 32, 8
    dtype = np.float32

    op, _ = models.laplacian_2d(nx, dtype=dtype)
    cfg = IRAMConfig(n=op.n, nev=nev, ncv=ncv, which="LA", symmetric=True,
                     dtype=np.dtype(dtype), n_pad=op.n_pad, tol=1e-30,
                     max_iter=10_000)
    solver = FusedSymSolver(op, cfg)

    # warmup: init + one full fused cycle (compiles everything)
    state = solver.init_state()
    out = solver._cycle(state, jnp.bool_(False))
    state = out.state
    state.rnorm.block_until_ready()

    # timed: fixed number of restart cycles (tol unreachable)
    cycles = 8
    nopx0 = int(jax.device_get(state.counts).nopx)
    t0 = time.perf_counter()
    for _ in range(cycles):
        out = solver._cycle(state, jnp.bool_(False))
        state = out.state
    state.rnorm.block_until_ready()
    dt = time.perf_counter() - t0
    nopx1 = int(jax.device_get(state.counts).nopx)
    n_matvecs = max(nopx1 - nopx0, 1)

    nnz = 5 * cfg.n                      # 5-point stencil
    nnz_per_s = n_matvecs * nnz / dt

    # roofline: stencil matvec streams ~3 f32/point (x in, y out, + reuse)
    # at HBM BW; through-solver work adds ~2*ncv*n flops/step of CGS.
    # Use a fixed nominal bound so vs_baseline is comparable across rounds:
    bw_bytes = 819e9                     # v5e HBM
    bound_nnz_s = bw_bytes / 12.0 * 5.0  # ~12 B/point streamed, 5 nnz/point
    vs = nnz_per_s / bound_nnz_s

    print(f"# n={cfg.n} ncv={ncv} cycles={cycles} matvecs={n_matvecs} "
          f"wall={dt:.3f}s cycle={dt/cycles*1e3:.1f}ms "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)
    print(json.dumps({
        "metric": "eigensolve_spmv_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
