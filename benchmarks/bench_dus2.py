"""Verify the V-layout fix for the row-access tiling penalty.

bench_dus.py measured: DUS of one (1, n) row into a (32, n) f32 basis
costs 126 us and a dynamic row read 60 us (SoL ~5 us each).  Mechanism
hypothesis: XLA tiles the trailing two dims (8, 128), so a (32, 1M)
array interleaves 8 DIFFERENT ROWS per tile — single-row access becomes
a read-modify-write over the whole 8-row tile group (~32 MB).

Candidate fix: keep V as (ncv, n/128, 128).  Tiling then applies to
(n/128, 128) WITHIN a row: every row owns its tiles, row DUS/DS is
tile-aligned.  This bench measures, on the real chip:

  dus3d / read3d   row write/read on the 3-D layout
  step3d           the full selective step on the 3-D layout
  proj3d+upd3d     the reorth pass pair contracting over (n/128, 128)
  rot3d            rotation via dot_general over the 3-D layout
  rot_nochain      2-D rotation without the abs-chain epilogue (isolates
                   how much of the 927 us rotation is the chain pass)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--ncv", type=int, default=32)
    args = ap.parse_args()

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

    nx, ncv = args.nx, args.ncv
    n = nx * nx
    npan = n // 128
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x3 = x0.reshape(npan, 128)
    V3 = jnp.asarray((rng.standard_normal((ncv, npan, 128)) * 1e-3)
                     .astype(np.float32))
    V2 = jnp.asarray((rng.standard_normal((ncv, n)) * 1e-3)
                     .astype(np.float32))

    def chain(y):
        return y + 1e-6 * jnp.abs(y)

    def timeit(name, make_fn, state, model_bytes, iters):
        f = jax.jit(make_fn(iters))
        st, s = f(state)
        float(jax.device_get(s))
        t0 = time.perf_counter()
        st, s = f(st)
        float(jax.device_get(s))
        wall = time.perf_counter() - t0
        per_it = wall / iters
        sol = model_bytes / BW
        print(f"{name:14s} {per_it*1e6:9.1f} us/iter  SoL {sol*1e6:7.1f} "
              f"us  eff {sol/per_it:5.2f}   ({wall*1e3:.0f} ms)",
              flush=True)
        return st

    IT = 2048

    def mk_dus3d(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                V = lax.dynamic_update_slice(V, r[None], (j, 0, 0))
                return V, chain(r)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[0, :8], r[0, :8]) + V[0, 0, 0]
        return f

    timeit("dus3d", mk_dus3d, (V3, x3), 8 * n, IT)

    def mk_read3d(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                vj = lax.dynamic_index_in_dim(V, j, axis=0, keepdims=False)
                return V, chain(r + 1e-7 * vj)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[0, :8], r[0, :8])
        return f

    timeit("read3d", mk_read3d, (V3, x3), 8 * n, IT)

    # the full selective step on the 3-D layout ------------------------
    def stencil3(x3):
        u = x3.reshape(nx, nx)
        y = 4.0 * u
        y = y - jnp.pad(u[1:, :], ((0, 1), (0, 0)))
        y = y - jnp.pad(u[:-1, :], ((1, 0), (0, 0)))
        y = y - jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
        y = y - jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
        return y.reshape(npan, 128)

    def mk_step3d(iters):
        def f(c):
            def body(i, c):
                V, r, rn = c
                j = jnp.mod(i, ncv)
                inv = 1.0 / jnp.maximum(rn, 1e-30)
                v = r * inv
                V = lax.dynamic_update_slice(V, v[None], (j, 0, 0))
                w = stencil3(v)
                alpha = jnp.sum(v * w)
                vjm1 = lax.dynamic_index_in_dim(
                    V, jnp.maximum(j - 1, 0), axis=0, keepdims=False)
                r2 = w - alpha * v - rn * vjm1
                rn2 = jnp.sqrt(jnp.sum(r2 * r2))
                return V, chain(r2), rn2
            V, r, rn = lax.fori_loop(0, iters, body, c)
            return (V, r, rn), rn
        return f

    timeit("step3d", mk_step3d, (V3, x3, jnp.float32(1.0)), 32 * n, IT)

    # reorth pass pair on the 3-D layout -------------------------------
    def mk_reorth3d(iters):
        def f(c):
            def body(i, c):
                V, r = c
                s = lax.dot_general(V, r, (((1, 2), (0, 1)), ((), ())))
                r2 = r - lax.dot_general(s, V, (((0,), (0,)), ((), ())))
                rn2 = jnp.sum(r2 * r2)
                return V, chain(r2 / jnp.sqrt(jnp.maximum(rn2, 1e-30)))
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[0, :8], r[0, :8])
        return f

    timeit("reorth3d", mk_reorth3d, (V3, x3), 2 * ncv * 4 * n, 512)

    # rotation variants --------------------------------------------------
    Q0 = jnp.asarray(np.linalg.qr(
        rng.standard_normal((ncv, ncv)))[0].astype(np.float32))

    def mk_rot3d(iters):
        def f(c):
            def body(i, c):
                V, Q = c
                V2 = lax.dot_general(Q, V, (((0,), (0,)), ((), ())))
                return V2, Q
            V, Q = lax.fori_loop(0, iters, body, c)
            return (V, Q), jnp.vdot(V[0, 0, :8], V[0, 0, :8])
        return f

    timeit("rot3d", mk_rot3d, (V3, Q0), 2 * ncv * 4 * n, 256)

    def mk_rot2d_nochain(iters):
        def f(c):
            def body(i, c):
                V, Q = c
                return Q.T @ V, Q
            V, Q = lax.fori_loop(0, iters, body, c)
            return (V, Q), jnp.vdot(V[0, :8], V[0, :8])
        return f

    timeit("rot2d_nochain", mk_rot2d_nochain, (V2, Q0),
           2 * ncv * 4 * n, 256)

    print(f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
