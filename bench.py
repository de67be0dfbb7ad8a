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

    try:  # persistent compile cache: repeat driver runs skip the ~min-long
        # remote TPU compilation
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from arpack_ng_tpu import models
    from arpack_ng_tpu.config import IRAMConfig
    from arpack_ng_tpu.core.device_sym import FusedSymSolver

    nx = 1024                      # n = 1,048,576
    ncv, nev = 32, 8
    dtype = np.float32

    op, _ = models.laplacian_2d(nx, dtype=dtype)
    # reorth='selective' is the production eigsh default (api.py): partial-
    # reorthogonalization Lanczos — the three-term recurrence streams zero
    # rows of V on most steps; full CGS fires only when Simon's omega
    # recurrence says semi-orthogonality is at risk.
    cfg = IRAMConfig(n=op.n, nev=nev, ncv=ncv, which="LA", symmetric=True,
                     dtype=np.dtype(dtype), n_pad=op.n_pad, tol=1e-30,
                     max_iter=10_000, reorth="selective")
    solver = FusedSymSolver(op, cfg)

    # warmup: init + one multi-cycle dispatch (compiles everything).
    # NOTE: this TPU is remote-attached; per-dispatch round-trip latency is
    # tens of ms, so the benchmark (like the production path) runs the
    # whole restart loop on device in ONE dispatch and forces completion
    # with a scalar readback.
    state = solver.init_state()
    out = solver._multi(state, jnp.int32(2), jnp.int32(10_000))
    state = out.state
    float(jax.device_get(state.rnorm))

    # timed: fixed number of restart cycles (tol unreachable) in a single
    # on-device while_loop dispatch
    cycles = 40
    counts0 = jax.device_get(state.counts)
    nopx0 = int(counts0.nopx)
    nopx_warm_ro = int(counts0.nrorth)
    iter0 = int(jax.device_get(state.iter))
    t0 = time.perf_counter()
    out = solver._multi(state, jnp.int32(cycles), jnp.int32(10_000))
    state = out.state
    float(jax.device_get(state.rnorm))   # forces execution through relay
    dt = time.perf_counter() - t0
    cycles = int(jax.device_get(state.iter)) - iter0
    nopx1 = int(jax.device_get(state.counts).nopx)
    n_matvecs = max(nopx1 - nopx0, 1)

    nnz = 5 * cfg.n                      # 5-point stencil
    nnz_per_s = n_matvecs * nnz / dt

    # Roofline of the REFERENCE's algorithm (dsaitr full-CGS) at HBM
    # bandwidth — the fixed baseline.  Per Lanczos step the reference
    # reads V twice (projection + update); each refinement event adds two
    # more passes; the matvec streams ~12 B/point; the end-of-cycle
    # rotation V <- Q^T V streams V twice.  vs_baseline > 1 means this
    # solver beats a speed-of-light execution of the reference algorithm
    # on the same chip (partial reorthogonalization streams V only on the
    # rare refinement events).
    counts = jax.device_get(state.counts)
    n_refine = int(counts.nrorth) - nopx_warm_ro
    itemsize = np.dtype(dtype).itemsize
    v_bytes = ncv * cfg.n_pad * itemsize
    traffic = (n_matvecs * 2 * v_bytes          # CGS
               + n_refine * 2 * v_bytes          # DGKS passes (timed window
                                                 # approximation)
               + n_matvecs * 12 * cfg.n          # matvec stream
               + cycles * 2 * v_bytes)           # V <- Q^T V
    bw_bytes = 819e9                             # v5e HBM
    bound_t = traffic / bw_bytes
    vs = bound_t / dt                            # fraction of speed-of-light

    print(f"# n={cfg.n} ncv={ncv} cycles={cycles} matvecs={n_matvecs} "
          f"refines={n_refine} wall={dt:.3f}s cycle={dt/cycles*1e3:.1f}ms "
          f"roofline={bound_t*1e3:.1f}ms ({vs*100:.0f}% of SoL) "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)
    print(json.dumps({
        "metric": "eigensolve_spmv_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
