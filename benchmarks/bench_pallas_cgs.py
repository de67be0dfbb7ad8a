"""A/B: Pallas CGS kernels (ops/pallas_cgs.py) vs XLA GEMVs at solver
shapes, on the attached TPU, chained-readback protocol (docs/PERF.md)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from arpack_ng_tpu.ops import pallas_cgs

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    n = 1 << 20
    iters = 200
    bw = 819e9
    results = []

    def timeit(name, fn, V, carry0, pass_bytes):
        f = jax.jit(fn)
        carry = f(V, carry0)
        float(jax.device_get(jnp.sum(carry)))
        t0 = time.perf_counter()
        out = f(V, carry)
        float(jax.device_get(jnp.sum(out)))
        dt = time.perf_counter() - t0
        per = dt / iters
        results.append((name, per * 1e3, pass_bytes / per / 1e9,
                        100.0 * (pass_bytes / bw) / per))

    for rows in (8, 16, 32):
        V = jnp.asarray(np.random.default_rng(0).standard_normal(
            (rows, n)).astype(np.float32)) * 1e-3
        w0 = jnp.ones((n,), jnp.float32)
        proj = pallas_cgs.make_proj(rows, rows, n, "float32", "float32")
        upd = pallas_cgs.make_update(rows, rows, n, "float32", "float32")
        vb = rows * n * 4

        def pl_pair_loop(V, w0):
            def body(i, w):
                h = proj(V, w)
                r = upd(w, h, V)
                return r + 1e-6 * jnp.abs(r)
            return lax.fori_loop(0, iters, body, w0)

        def xla_pair_loop(V, w0):
            def body(i, w):
                h = V @ w
                r = w - h @ V
                return r + 1e-6 * jnp.abs(r)
            return lax.fori_loop(0, iters, body, w0)

        timeit(f"pallas pair rows={rows}", pl_pair_loop, V, w0,
               2 * vb + 3 * n * 4)
        timeit(f"xla    pair rows={rows}", xla_pair_loop, V, w0,
               2 * vb + 3 * n * 4)

    print(f"{'kernel':<24}{'ms/pair':>9}{'GB/s':>8}{'% SoL':>8}")
    for name, ms, gbs, pct in results:
        print(f"{name:<24}{ms:>9.3f}{gbs:>8.0f}{pct:>7.0f}%")


if __name__ == "__main__":
    main()
