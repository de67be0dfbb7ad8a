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

    # ---- round 5: scalar-prefetch Pallas event kernels ------------------
    # (ops/pallas_sel.py): stream the K indexed rows straight from the
    # basis via PrefetchScalarGridSpec index maps — no materialization.
    from arpack_ng_tpu.ops import pallas_sel
    interp = jax.default_backend() != "tpu"
    for K in (4, 8, 16):
        idx = jnp.asarray(np.sort(rng.choice(ncv, K, replace=False))
                          .astype(np.int32))
        proj = pallas_sel.make_sel_proj(K, ncv, npan, "float32", "float32",
                                        interpret=interp)
        updn = pallas_sel.make_sel_update(K, ncv, npan, "float32",
                                          "float32", with_norm=True,
                                          interpret=interp)

        def pl_pass(r, idx=idx, proj=proj, updn=updn):
            s = proj(idx, V, r.reshape(-1))
            r2, _ = updn(idx, s, r.reshape(-1), V)
            return r2.reshape(npan, 128)

        # value check vs the take path (the repo rule: VALUE-check every
        # new TPU path)
        def take_ref(r, idx=idx):
            Vg = jnp.take(V, idx, axis=0)
            s = lax.dot_general(Vg, r, (((1, 2), (0, 1)), ((), ())))
            return r - lax.dot_general(s, Vg, (((0,), (0,)), ((), ())))

        with jax.default_matmul_precision("highest"):
            a = np.asarray(jax.device_get(jax.jit(pl_pass)(r0)))
            b = np.asarray(jax.device_get(jax.jit(take_ref)(r0)))
        verr = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
        tag = "OK" if verr < 1e-5 else "MISMATCH"
        timeit(f"pallas-sel-{K} pass pair [{tag} {verr:.1e}]", pl_pass,
               rows=K)

    print(f"(full pair baseline {t_full*1e6:.0f} us; "
          f"platform={jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
