"""Microbenchmark: raw streaming efficiency of the solver's hot GEMV
shapes on the attached TPU.

Measures the two CGS contractions at solver shapes — projection
``h = V @ w`` ((ncv, n) @ (n,)) and combination ``r = h @ V`` — plus the
paired proj+comb sequence, for several row counts, each as a chained
``lax.fori_loop`` inside ONE dispatch with a data-dependent scalar
readback (see docs/PERF.md measurement protocol; naive timing through the
axon relay reports impossible numbers).

Purpose: decide whether a hand-written Pallas CGS kernel can beat XLA's
GEMV streaming.  If these numbers sit near HBM speed-of-light, the
remaining solver gap is protocol/latency, not kernel quality.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    n = 1 << 20
    iters = 200
    bw = 819e9  # v5e HBM bytes/s

    results = []

    def timeit(name, fn, V, carry0, traffic_bytes):
        # The relay returns cached results for a dispatch with identical
        # inputs, so the timed call MUST consume the warmup's output
        # (docs/PERF.md protocol: chained inputs + scalar readback).
        f = jax.jit(fn)
        carry = f(V, carry0)
        float(jax.device_get(jnp.sum(carry)))   # force warmup execution
        t0 = time.perf_counter()
        out = f(V, carry)
        s = float(jax.device_get(jnp.sum(out)))
        dt = time.perf_counter() - t0
        per = dt / iters
        per_pass_bytes = traffic_bytes / iters
        sol = per_pass_bytes / bw
        results.append((name, per * 1e3, per_pass_bytes / per / 1e9,
                        100.0 * sol / per))
        return s

    for rows in (8, 16, 32):
        V = jnp.asarray(np.random.default_rng(0).standard_normal(
            (rows, n)).astype(np.float32)) * 1e-3

        # The chained perturbation must be NONLINEAR in the carried vector:
        # with w' = c*w (scalar) XLA strength-reduces dot(V, c*w) to
        # c*dot(V, w) and hoists the GEMV out of the loop entirely (first
        # version of this file measured "39 TB/s").  abs() blocks every
        # algebraic rewrite while keeping magnitudes stable.
        def proj_loop(V, w0):
            def body(i, w):
                h = V @ w
                s = h[0] / (1.0 + jnp.abs(h[0]))
                return w + 1e-6 * s * jnp.abs(w)
            return lax.fori_loop(0, iters, body, w0)

        def comb_loop(V, h0):
            def body(i, h):
                r = h @ V
                s = r[0] / (1.0 + jnp.abs(r[0]))
                return h + 1e-6 * s * jnp.abs(h)
            return lax.fori_loop(0, iters, body, h0)

        def pair_loop(V, w0):
            def body(i, w):
                h = V @ w
                r = w - h @ V
                return r + 1e-6 * jnp.abs(r)
            return lax.fori_loop(0, iters, body, w0)

        w0 = jnp.ones((n,), jnp.float32)
        h0 = jnp.ones((rows,), jnp.float32)
        vb = rows * n * 4
        timeit(f"proj rows={rows}", proj_loop, V, w0,
               traffic_bytes=iters * (vb + n * 4))
        timeit(f"comb rows={rows}", comb_loop, V, h0,
               traffic_bytes=iters * (vb + n * 4))
        timeit(f"proj+comb rows={rows}", pair_loop, V, w0,
               traffic_bytes=iters * (2 * vb + 3 * n * 4))


    print(f"{'kernel':<22}{'ms/pass':>9}{'GB/s':>9}{'% SoL':>8}")
    for name, ms, gbs, pct in results:
        print(f"{name:<22}{ms:>9.3f}{gbs:>9.1f}{pct:>7.0f}%")


if __name__ == "__main__":
    main()


def layout_ab():
    """A/B: row layout (ncv, n) vs column layout (n, ncv) for the CGS
    pair — decides whether the solver's V orientation leaves streaming
    on the table (hidden transposes would show as a fixed per-pass
    cost)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    n = 1 << 20
    iters = 200
    bw = 819e9
    rows = 32
    rng = np.random.default_rng(0)
    Vr = jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32)) * 1e-3
    Vc = jnp.asarray(np.asarray(Vr).T.copy())
    w0 = jnp.ones((n,), jnp.float32)

    def row_pair(V, w0):
        def body(i, w):
            h = V @ w
            r = w - h @ V
            return r + 1e-6 * jnp.abs(r)
        return lax.fori_loop(0, iters, body, w0)

    def col_pair(V, w0):
        def body(i, w):
            h = w @ V
            r = w - V @ h
            return r + 1e-6 * jnp.abs(r)
        return lax.fori_loop(0, iters, body, w0)

    pass_bytes = 2 * rows * n * 4 + 3 * n * 4
    for name, fn, V in (("row (ncv,n)", row_pair, Vr),
                        ("col (n,ncv)", col_pair, Vc)):
        f = jax.jit(fn)
        carry = f(V, w0)
        float(jax.device_get(jnp.sum(carry)))
        t0 = time.perf_counter()
        out = f(V, carry)
        float(jax.device_get(jnp.sum(out)))
        per = (time.perf_counter() - t0) / iters
        print(f"{name}: {per*1e3:.3f} ms/pair "
              f"({pass_bytes/per/1e9:.0f} GB/s, "
              f"{100*(pass_bytes/bw)/per:.0f}% SoL)")
