"""Benchmark: flagship symmetric eigensolve throughput on one chip.

Workload: dssimp-class 2-D Dirichlet Laplacian (5-point stencil), n = nx^2,
float32, ncv-step Lanczos cycles of the IRAM solver — the reference's
dominant cost profile (per restart cycle: np matvecs + O(n*ncv) CGS,
SRC/dsaupd.f:139-145).

Two variants run on the chip:

* **reference algorithm**: full classical Gram-Schmidt per step with the
  0.717 DGKS refinement test — exactly dsaitr's schedule
  (SRC/dsaitr.f:570-781).  Its measured refinement RATE defines the
  baseline traffic model.
* **production algorithm** (eigsh default): partial-reorthogonalization
  Lanczos — three-term recurrence with Simon's omega-recurrence tracking;
  full CGS only when semi-orthogonality is at risk.

Metric: sustained operator-application throughput through the *whole*
production solver (matvec + orthogonalization + basis updates), as nnz/s
(stencil nnz ~= 5n).  ``vs_baseline`` = (HBM-speed-of-light time of the
REFERENCE algorithm doing the same number of Lanczos steps, using the
reference's own measured DGKS refinement rate) / (our measured wall).
vs_baseline > 1 means this solver beats a zero-overhead execution of the
reference's algorithm on the same chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}
"""
import json
import sys
import time


def main():
    import numpy as np
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
    target_cycles = 40             # timed cycles per variant (>= this)

    op, _ = models.laplacian_2d(nx, dtype=dtype)

    def make_solver(reorth):
        cfg = IRAMConfig(n=op.n, nev=nev, ncv=ncv, which="LA",
                         symmetric=True, dtype=np.dtype(dtype), tol=1e-30,
                         n_pad=op.n_pad, max_iter=10_000, reorth=reorth)
        return FusedSymSolver(op, cfg)

    def measure(solver):
        """Accumulate >= target_cycles timed restart cycles over fresh-seed
        windows (the solve converges to the f32 invariant-subspace floor in
        ~20 cycles, so one window cannot be made arbitrarily long).  Each
        window is ONE on-device while_loop dispatch, forced complete with a
        scalar readback (the relay requires data-dependent readbacks; fresh
        seeds make every dispatch's inputs unique so nothing is served from
        the relay's dispatch cache)."""
        # warmup/compile
        state = solver.init_state(jax.random.key(123))
        out = solver._multi(state, jnp.int32(2), jnp.int32(10_000))
        float(jax.device_get(out.state.rnorm))

        tot = dict(dt=0.0, cycles=0, matvecs=0, refines=0)
        seed = 1000
        while tot["cycles"] < target_cycles:
            state = solver.init_state(jax.random.key(seed))
            seed += 1
            c0 = jax.device_get(state.counts)
            it0 = int(jax.device_get(state.iter))
            t0 = time.perf_counter()
            out = solver._multi(state, jnp.int32(target_cycles),
                                jnp.int32(10_000))
            float(jax.device_get(out.state.rnorm))  # force through relay
            dt = time.perf_counter() - t0
            c1 = jax.device_get(out.state.counts)
            tot["dt"] += dt
            tot["cycles"] += int(jax.device_get(out.state.iter)) - it0
            tot["matvecs"] += int(c1.nopx) - int(c0.nopx)
            tot["refines"] += int(c1.nrorth) - int(c0.nrorth)
        return tot

    ref = measure(make_solver("dgks"))        # the reference algorithm
    prod = measure(make_solver("selective"))  # the production default

    n, n_pad = op.n, op.n_pad
    nnz = 5 * n                               # 5-point stencil
    nnz_per_s = prod["matvecs"] * nnz / prod["dt"]

    # HBM speed-of-light of the REFERENCE algorithm (dsaitr full CGS) doing
    # the production run's Lanczos steps, with the reference's own measured
    # DGKS refinement rate.  Per step CGS reads V twice (projection +
    # update, SRC/dsaitr.f:570-583); each DGKS refinement adds two more
    # passes (:656-781); the stencil matvec streams ~12 B/point; the
    # end-of-cycle rotation V <- Q^T V streams V twice (dsapps V*Q).
    itemsize = np.dtype(dtype).itemsize
    v_bytes = ncv * n_pad * itemsize
    ref_rate = ref["refines"] / max(ref["matvecs"], 1)
    steps = prod["matvecs"]
    traffic = (steps * 2 * v_bytes
               + ref_rate * steps * 2 * v_bytes
               + steps * 12 * n
               + prod["cycles"] * 2 * v_bytes)
    bw_bytes = 819e9                          # v5e HBM
    bound_t = traffic / bw_bytes
    vs = bound_t / prod["dt"]

    ref_per_mv = ref["dt"] / max(ref["matvecs"], 1)
    prod_per_mv = prod["dt"] / max(steps, 1)
    print(f"# reference(dgks): cycles={ref['cycles']} "
          f"matvecs={ref['matvecs']} refines={ref['refines']} "
          f"(rate {ref_rate:.2f}) wall={ref['dt']:.3f}s "
          f"per-matvec={ref_per_mv*1e3:.2f}ms", file=sys.stderr)
    print(f"# production(selective): cycles={prod['cycles']} "
          f"matvecs={prod['matvecs']} refines={prod['refines']} "
          f"wall={prod['dt']:.3f}s per-matvec={prod_per_mv*1e3:.2f}ms "
          f"measured speedup vs dgks={ref_per_mv/prod_per_mv:.2f}x",
          file=sys.stderr)
    print(f"# n={n} ncv={ncv} roofline(ref alg)={bound_t*1e3:.1f}ms "
          f"wall={prod['dt']*1e3:.1f}ms -> vs_baseline={vs:.3f} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)
    print(json.dumps({
        "metric": "eigensolve_spmv_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
