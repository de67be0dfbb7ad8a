"""Isolate the V-row dynamic_update_slice cost inside a fori_loop.

bench_step_breakdown.py showed the full selective step costs 187 us
while the identical step without the V row write / v_{j-1} row read runs
at 32 us (eff 0.95) — the difference is one full V pass (~156 us at
819 GB/s for ncv=32, n=1M f32), i.e. the basis is re-streamed or copied
every step.  This bench separates the suspects:

  dus_only     V = DUS(V, row_j)                 (write 4 MB: ~5 us SoL)
  read_only    vjm1 = V[j-1]  (dynamic index)    (read 4 MB: ~5 us SoL)
  dus_read     both, read AFTER write (the solver's pattern)
  dus_read_pre both, read BEFORE the write of the same iteration
  dus_carry    DUS write + v_{j-1} carried in the loop state (no V read)
  rot_dot      V2 = Q^T V as dot_general         (rotation reference)
  rot_dot_pre  same with preferred f32 accum + transposed layouts

Protocol: jit returns a data-dependent scalar; one device_get; warmup
output feeds the timed call; nonlinear chaining.
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
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    V0 = jnp.asarray(rng.standard_normal((ncv, n)).astype(np.float32)
                     * 1e-3)

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

    # write one row at dynamic j (r evolves so the write content changes)
    def mk_dus_only(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                V = lax.dynamic_update_slice(V, r[None, :], (j, 0))
                return V, chain(r)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[:8], r[:8]) + jnp.vdot(V[0, :8],
                                                             V[0, :8])
        return f

    timeit("dus_only", mk_dus_only, (V0, x0), 8 * n, IT)

    def mk_read_only(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                vj = lax.dynamic_index_in_dim(V, j, axis=0, keepdims=False)
                return V, chain(r + 1e-7 * vj)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[:8], r[:8])
        return f

    timeit("read_only", mk_read_only, (V0, x0), 8 * n, IT)

    def mk_dus_read(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                V = lax.dynamic_update_slice(V, r[None, :], (j, 0))
                vjm1 = lax.dynamic_index_in_dim(
                    V, jnp.maximum(j - 1, 0), axis=0, keepdims=False)
                return V, chain(r + 1e-7 * vjm1)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[:8], r[:8])
        return f

    timeit("dus_read", mk_dus_read, (V0, x0), 12 * n, IT)

    def mk_dus_read_pre(iters):
        def f(c):
            def body(i, c):
                V, r = c
                j = jnp.mod(i, ncv)
                vjm1 = lax.dynamic_index_in_dim(
                    V, jnp.maximum(j - 1, 0), axis=0, keepdims=False)
                V = lax.dynamic_update_slice(V, r[None, :], (j, 0))
                return V, chain(r + 1e-7 * vjm1)
            V, r = lax.fori_loop(0, iters, body, c)
            return (V, r), jnp.vdot(r[:8], r[:8])
        return f

    timeit("dus_read_pre", mk_dus_read_pre, (V0, x0), 12 * n, IT)

    def mk_dus_carry(iters):
        def f(c):
            def body(i, c):
                V, r, vprev = c
                j = jnp.mod(i, ncv)
                V = lax.dynamic_update_slice(V, r[None, :], (j, 0))
                r2 = chain(r + 1e-7 * vprev)
                return V, r2, r
            V, r, vp = lax.fori_loop(0, iters, body, c)
            return (V, r, vp), jnp.vdot(r[:8], r[:8])
        return f

    timeit("dus_carry", mk_dus_carry, (V0, x0, x0), 12 * n, IT)

    # rotation variants ------------------------------------------------
    Q0 = jnp.asarray(np.linalg.qr(
        rng.standard_normal((ncv, ncv)))[0].astype(np.float32))

    def mk_rot(iters, variant):
        def f(c):
            def body(i, c):
                V, Q = c
                if variant == "qtv":
                    V2 = Q.T @ V
                elif variant == "dotg":
                    V2 = lax.dot_general(
                        Q, V, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return V2 + 1e-6 * jnp.abs(V2), Q
            V, Q = lax.fori_loop(0, iters, body, c)
            return (V, Q), jnp.vdot(V[0, :8], V[0, :8])
        return f

    timeit("rot_qtv", lambda it: mk_rot(it, "qtv"), (V0, Q0),
           2 * ncv * 4 * n, 256)
    timeit("rot_dotg", lambda it: mk_rot(it, "dotg"), (V0, Q0),
           2 * ncv * 4 * n, 256)

    # rotation with V laid out (npanels, ncv, 128*k): batched small GEMMs
    def mk_rot_3d(iters, tile):
        npan = n // tile
        V3 = V0.reshape(ncv, npan, tile).transpose(1, 0, 2)  # (npan,ncv,t)

        def f(c):
            def body(i, c):
                V, Q = c
                V2 = jnp.einsum("ij,pjt->pit", Q, V,
                                preferred_element_type=jnp.float32)
                return V2 + 1e-6 * jnp.abs(V2), Q
            V, Q = lax.fori_loop(0, iters, body, c)
            return (V, Q), jnp.vdot(V[0, 0, :8], V[0, 0, :8])
        return f, V3

    for tile in (512, 2048):
        fn, V3 = mk_rot_3d(None, tile)

        def mk(it, t=tile):
            f, _ = mk_rot_3d(it, t)
            return f

        timeit(f"rot_3d_{tile}", mk, (V3, Q0), 2 * ncv * 4 * n, 256)

    print(f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
