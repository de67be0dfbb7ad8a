"""On-chip eigensolve throughput per IRREGULAR structure class (the
SuiteSparse-class corpus of models/corpus.py) — round-3 verdict item #5.

For each class the matrix goes through ``from_scipy(format='auto')``
exactly as a user's would; the fused symmetric solver then runs
fixed-cycle windows at floor tolerance (the bench.py measurement
protocol: fresh seeds per window, data-dependent readback) and the
sustained operator throughput is reported as Gnnz/s of the REAL nnz —
for the hybrid format that measures the padding policy, not just the
gather kernel.

Usage: python benchmarks/bench_corpus.py [--small]
Prints a markdown table: class | n | nnz | format | Gnnz/s.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(op, ncv=32, nev=8, target_cycles=12):
    import jax
    import jax.numpy as jnp
    from arpack_ng_tpu.config import IRAMConfig
    from arpack_ng_tpu.core.device_sym import FusedSymSolver

    cfg = IRAMConfig(n=op.n, nev=nev, ncv=ncv, which="LM", symmetric=True,
                     dtype=np.dtype(op.dtype), tol=1e-30, n_pad=op.n_pad,
                     max_iter=10_000, reorth="selective")
    solver = FusedSymSolver(op, cfg)
    state = solver.init_state(jax.random.key(7))
    out = solver._multi(state, jnp.int32(2), jnp.int32(10_000))
    float(jax.device_get(out.state.rnorm))          # warmup/compile
    tot_dt, tot_mv, seed = 0.0, 0, 100
    cycles = 0
    while cycles < target_cycles:
        state = solver.init_state(jax.random.key(seed))
        seed += 1
        c0 = jax.device_get(state.counts)
        it0 = int(jax.device_get(state.iter))
        t0 = time.perf_counter()
        out = solver._multi(state, jnp.int32(target_cycles),
                            jnp.int32(10_000))
        float(jax.device_get(out.state.rnorm))
        tot_dt += time.perf_counter() - t0
        c1 = jax.device_get(out.state.counts)
        cycles += int(jax.device_get(out.state.iter)) - it0
        tot_mv += int(c1.nopx) - int(c0.nopx)
    return tot_dt, tot_mv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    if args.small:
        # CPU sanity tier: skip the persistent cache (the relay-oriented
        # cache emits AOT machine-feature warnings on this host CPU)
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1)
        except Exception:
            pass

    from arpack_ng_tpu.models import corpus
    from arpack_ng_tpu.ops.sparse import from_scipy

    if args.small:
        cases = [("fem-p1", corpus.fem_triangulation(12_000)),
                 ("powerlaw", corpus.powerlaw_graph(12_000)),
                 ("saddle-kkt", corpus.saddle_point(70))]
    else:
        cases = [("fem-p1", corpus.fem_triangulation(200_000)),
                 ("powerlaw", corpus.powerlaw_graph(200_000)),
                 ("saddle-kkt", corpus.saddle_point(320))]

    plat = jax.devices()[0].platform
    print(f"## irregular-corpus eigensolve throughput (platform: {plat})\n")
    print("| class | n | nnz | auto format | per-matvec | Gnnz/s (real nnz) |")
    print("|---|---|---|---|---|---|")
    for name, a in cases:
        op = from_scipy(a.astype(np.float32), hermitian=True)
        dt, mv = measure(op)
        per = dt / max(mv, 1)
        gnnz = a.nnz * mv / dt / 1e9
        print(f"| {name} | {a.shape[0]} | {a.nnz} | {op.format} "
              f"| {per*1e3:.2f} ms | {gnnz:.2f} |", flush=True)


if __name__ == "__main__":
    main()
