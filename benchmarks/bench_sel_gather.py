"""Microbench: K-row SUBSET reorthogonalization pass vs the full bucketed
pass (design probe for PROPACK-style eta-subset reorth, round 4).

The selective path's reorth events currently stream the whole active
bucket twice; the omega recurrence knows WHICH rows lost orthogonality
(typically a handful — the converged Ritz directions, Larsen/PROPACK
eta-selection).  This measures, on the real chip:

  full:   s = V[:32]^H w ; r -= s @ V[:32]            (2 full passes)
  take-K: Vg = take(V, idx) ; s = Vg^H w ; r -= s @ Vg (K rows, if XLA
          fuses the gather into the contractions; if it materializes Vg
          the win halves)

Usage: python benchmarks/bench_sel_gather.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BW = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    ncv, n = 32, 1024 * 1024
    npan = n // 128
    rng = np.random.default_rng(0)
    V = jnp.asarray((rng.standard_normal((ncv, npan, 128)) * 1e-2)
                    .astype(np.float32))
    r0 = jnp.asarray(rng.standard_normal((npan, 128)).astype(np.float32))

    def timeit(name, body, iters=192, rows=ncv):
        def mk(r):
            def f(i, r):
                r = body(r)
                return r + 1e-6 * jnp.abs(r)    # nonlinear chain
            r = lax.fori_loop(0, iters, f, r)
            return r, jnp.vdot(r[0, :8], r[0, :8])
        g = jax.jit(mk)
        r, s = g(r0); float(jax.device_get(s))
        t0 = time.perf_counter()
        r, s = g(r); float(jax.device_get(s))
        per = (time.perf_counter() - t0) / iters
        traffic = 2 * rows * npan * 128 * 4
        print(f"{name:26s} {per*1e6:8.1f} us  ({traffic/per/1e9:5.0f} GB/s "
              f"on {rows}-row pass pair)", flush=True)
        return per

    def full_pass(r):
        s = lax.dot_general(V, r, (((1, 2), (0, 1)), ((), ())))
        return r - lax.dot_general(s, V, (((0,), (0,)), ((), ())))

    t_full = timeit("full 32-row pass pair", full_pass)

    for K in (4, 8, 16):
        idx = jnp.asarray(np.sort(rng.choice(ncv, K, replace=False))
                          .astype(np.int32))

        def take_pass(r, idx=idx, K=K):
            Vg = jnp.take(V, idx, axis=0)
            s = lax.dot_general(Vg, r, (((1, 2), (0, 1)), ((), ())))
            return r - lax.dot_general(s, Vg, (((0,), (0,)), ((), ())))

        timeit(f"take-{K} pass pair", take_pass, rows=K)

        # gather-free: one dynamic_index per row (tile-aligned row reads)
        def dyn_pass(r, idx=idx, K=K):
            rows = [lax.dynamic_index_in_dim(V, idx[k], 0, keepdims=False)
                    for k in range(K)]
            Vg = jnp.stack(rows)
            s = lax.dot_general(Vg, r, (((1, 2), (0, 1)), ((), ())))
            return r - lax.dot_general(s, Vg, (((0,), (0,)), ((), ())))

        timeit(f"dyn-index-{K} pass pair", dyn_pass, rows=K)

    print(f"(full pair baseline {t_full*1e6:.0f} us; "
          f"platform={jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
