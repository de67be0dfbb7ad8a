"""A/B the Pallas basis-rotation kernel vs the XLA contraction (real TPU).

Usage: python benchmarks/bench_rot_pallas.py
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

    from arpack_ng_tpu.ops import pallas_rot

    ncv, n = 32, 1024 * 1024
    npan = n // 128
    rng = np.random.default_rng(0)
    V3 = jnp.asarray((rng.standard_normal((ncv, npan, 128)) * 1e-2)
                     .astype(np.float32))
    Q0 = jnp.asarray(np.linalg.qr(
        rng.standard_normal((ncv, ncv)))[0].astype(np.float32))
    model = 2 * ncv * 4 * n
    interp = jax.default_backend() != "tpu"

    def timeit(name, body, state, iters):
        def mk(c):
            def f(i, c):
                V, Q = c
                return body(Q, V), Q
            V, Q = lax.fori_loop(0, iters, f, c)
            return (V, Q), jnp.vdot(V[0, 0, :8], V[0, 0, :8])
        g = jax.jit(mk)
        st, s = g(state)
        float(jax.device_get(s))
        t0 = time.perf_counter()
        st, s = g(st)
        float(jax.device_get(s))
        per = (time.perf_counter() - t0) / iters
        print(f"{name:16s} {per*1e6:8.1f} us  eff {model/BW/per:5.2f}",
              flush=True)
        return st

    def xla_rot(Q, V):
        return lax.dot_general(Q, V, (((0,), (0,)), ((), ())))

    timeit("xla", xla_rot, (V3, Q0), 256)
    for P in (64, 128, 256):
        k = pallas_rot.make_rotate(ncv, npan, "float32", "float32",
                                   panels=P, interpret=interp)
        # correctness once
        ref = np.asarray(jax.device_get(xla_rot(Q0, V3)))
        got = np.asarray(jax.device_get(k(Q0, V3)))
        err = np.max(np.abs(ref - got))
        timeit(f"pallas P={P}", lambda Q, V, k=k: k(Q, V), (V3, Q0), 256)
        print(f"   max |diff| vs xla: {err:.2e}")
    print(f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
