"""Cost of even/odd de-interleave + re-interleave on TPU (1-D vs 2-D).

Cyclic reduction's inner pattern.  bench_banded_ilu measured 36.9 ms per
BCR solve at n=2^20, b=1: the (m, 1) block layout puts the block dim in
lanes (128x tile padding).  This measures the candidate replacements:

  split1d       fe, fo = x[0::2], x[1::2]; x' = chain(fe - a*fo)
  merge1d       x' = stack/reshape interleave of (fe, fo)
  shift_mask    full-length formulation: x - a*roll(x, 1) masked (no
                compaction; the level arrays stay n-long)
  cr_level      one full CR level: compaction + 2 muls + adds (1-D)

Usage: python benchmarks/bench_stride.py
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

    n = 1 << 20
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a0 = jnp.asarray((0.1 + 0.01 * rng.standard_normal(n))
                     .astype(np.float32))

    def chain(y):
        return y + 1e-6 * jnp.abs(y)

    def timeit(name, make_fn, state, model_bytes, iters=1024):
        f = jax.jit(make_fn(iters))
        st, s = f(state)
        float(jax.device_get(s))
        t0 = time.perf_counter()
        st, s = f(st)
        float(jax.device_get(s))
        per = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {per*1e6:8.1f} us  model {model_bytes/1e6:6.1f}"
              f" MB -> eff {model_bytes/BW/per:5.2f}", flush=True)

    def mk_split(iters):
        def f(c):
            def body(i, x):
                fe, fo = x[0::2], x[1::2]
                y = fe - 0.25 * fo
                return chain(jnp.concatenate([y, y]))
            x = lax.fori_loop(0, iters, body, c)
            return x, jnp.vdot(x[:8], x[:8])
        return f

    timeit("split1d", mk_split, x0, 3 * 4 * n)

    def mk_merge(iters):
        def f(c):
            def body(i, x):
                h = n // 2
                fe, fo = x[:h], x[h:]
                y = jnp.stack([fe, fo], axis=1).reshape(-1)
                return chain(y)
            x = lax.fori_loop(0, iters, body, c)
            return x, jnp.vdot(x[:8], x[:8])
        return f

    timeit("merge1d", mk_merge, x0, 3 * 4 * n)

    def mk_shift(iters):
        def f(c):
            x, a = c
            def body(i, c):
                x, a = c
                xs = jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
                y = x - a * xs
                return chain(y), a
            x, a = lax.fori_loop(0, iters, body, (x, a))
            return (x, a), jnp.vdot(x[:8], x[:8])
        return f

    timeit("shift_mask", mk_shift, (x0, a0), 3 * 4 * n)

    def mk_cr_level(iters):
        # one forward CR level, 1-D compaction form:
        # f' = fe - g*fo_left - h*fo
        def f(c):
            x, a = c
            def body(i, c):
                x, a = c
                fe, fo = x[0::2], x[1::2]
                g = a[0::2]
                fol = jnp.concatenate([jnp.zeros((1,), x.dtype), fo[:-1]])
                y = fe - g * fol - 0.3 * fo
                return chain(jnp.concatenate([y, y])), a
            x, a = lax.fori_loop(0, iters, body, (x, a))
            return (x, a), jnp.vdot(x[:8], x[:8])
        return f

    timeit("cr_level1d", mk_cr_level, (x0, a0), 4 * 4 * n)

    print(f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
