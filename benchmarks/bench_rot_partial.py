"""Measure the kev-row restart rotation (dsapps parity) on the real TPU.

The round-3 flagship rotated ALL ncv rows of Q^T V (2*ncv row-passes of
traffic, measured at its 280 GB/s machine ceiling).  The dsapps-parity
update (SRC/dsapps.f:445-481) writes only the surviving R = bucket(kev+1)
rows: traffic drops to (ncv reads + R writes) row-passes and the pattern
becomes read-dominated, which this chip serves faster than 1:1 streams
(docs/PERF.md machine-characteristics table).  This benchmark times the
XLA lowering of the partial update for each bucket R and reports the
delivered bandwidth of the ACTUAL traffic, to set the measured ceiling
used by bench.py's achievable-wall model.

Usage: python benchmarks/bench_rot_partial.py
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

    from arpack_ng_tpu.core.arnoldi import rotate_basis_kev

    ncv, n = 32, 1024 * 1024
    npan = n // 128
    rng = np.random.default_rng(0)
    V3 = jnp.asarray((rng.standard_normal((ncv, npan, 128)) * 1e-2)
                     .astype(np.float32))
    Q0 = jnp.asarray(np.linalg.qr(
        rng.standard_normal((ncv, ncv)))[0].astype(np.float32))

    def timeit(name, body, state, iters, traffic):
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
        print(f"{name:24s} {per*1e6:8.1f} us  delivered "
              f"{traffic/per/1e9:6.0f} GB/s  (eff vs nominal "
              f"{traffic/BW/per:5.2f})", flush=True)
        return per

    def full_rot(Q, V):
        return lax.dot_general(Q, V, (((0,), (0,)), ((), ())))

    row_b = 4 * n
    t_full = timeit("full (32 out)", full_rot, (V3, Q0), 256,
                    2 * ncv * row_b)

    # static-R partial updates (the branches rotate_basis_kev switches over)
    for R in (8, 16, 24, 32):
        def part(Q, V, R=R):
            top = lax.dot_general(Q[:, :R], V, (((0,), (0,)), ((), ())))
            return lax.dynamic_update_slice(V, top, (0, 0, 0))
        timeit(f"partial R={R:2d} (static)", part, (V3, Q0), 256,
               (ncv + R) * row_b)

    # the traced-kev switch exactly as the solver runs it
    for kev in (9, 12):
        def sw(Q, V, kev=kev):
            Vn, _, _ = rotate_basis_kev(Q, V, jnp.int32(kev), jnp.float32)
            return Vn
        timeit(f"switch kev={kev} (traced)", sw, (V3, Q0), 256,
               (ncv + ((kev // 8) + 1) * 8) * row_b)

    print(f"full rotation baseline: {t_full*1e6:.1f} us; "
          f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
