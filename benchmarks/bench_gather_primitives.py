"""Design probe (round 5): which gather primitive can carry an
irregular-sparsity SpMV at memory bandwidth on this TPU?

The round-4 corpus measurement (benchmarks/bench_corpus.py) put the
gather-ELL classes at 0.05 Gnnz/s — ~20 ns per gathered element — while
DIA streaming does 5.1 Gnnz/s on the same chip.  Every irregular SpMV
reduces to ``x[cols]``; this bench measures the candidate forms:

  1. flat element gather        x[cols]                (XLA, baseline)
  2. 128-wide row gather        X2d[rows]              (XLA dynamic-slice)
  3. lane shuffle               take_along_axis(X, l)  (idx < 128)
  4. one-hot sublane gather     onehot(sr) @ panel     (MXU)
  5. one-hot two-stage          onehot(sr) @ panel, lane-select (MXU+VPU)
  6. Pallas in-VMEM gather      jnp.take inside a kernel (does it even
                                 compile on Mosaic?)

Reference cost model being chased: the reference's users run plain CSR
at CPU STREAM bandwidth (EXAMPLES/MATRIX_MARKET/arpackSolver.hpp:233,
TESTS/dnsimp.f:192-194) — the TPU rebuild owes a form whose per-nnz cost
is bandwidth, not 20 ns of serial gather.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    n = 1 << 18                       # 262144-dim x (1 MB f32)
    nel = 1 << 21                     # 2M gathered elements per pass
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, n, nel).astype(np.int32))

    def timeit(name, body, arg, elems, iters=32):
        def mk(a):
            def f(i, a):
                out = body(a)
                # nonlinear chain through a scalar of the result
                return a + 1e-12 * jnp.abs(out.ravel()[0])
            a = lax.fori_loop(0, iters, f, a)
            return a, a.ravel()[0]
        g = jax.jit(mk)
        r, s = g(arg); float(jax.device_get(s))
        t0 = time.perf_counter()
        r, s = g(r); float(jax.device_get(s))
        per = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {per*1e6:9.1f} us   {per/elems*1e9:7.3f} ns/el",
              flush=True)
        return per

    # 1. flat element gather (the current ELL inner op)
    timeit("flat x[cols] (2M)", lambda a: a[cols], x, nel)

    # 2. row gather: 16384 rows of 128 (same 2M elements)
    X2 = x.reshape(-1, 128)
    rows_i = jnp.asarray(rng.integers(0, n // 128, nel // 128)
                         .astype(np.int32))
    timeit("row gather X2d[rows] (16k rows)",
           lambda a: a[rows_i], X2, nel)

    # 3. lane shuffle: (n//128, 128) take_along_axis with lane indices
    nrows2 = n // 128
    lidx = jnp.asarray(rng.integers(0, 128, (nrows2, 128))
                       .astype(np.int32))
    timeit("take_along_axis lanes",
           lambda a: jnp.take_along_axis(a, lidx, axis=1), X2, n)

    # 4. one-hot sublane gather out of a 128x128 panel: T=2M elements
    #    grouped 128 per MXU op -> (nel//128) batched (128,128)@(128,128)
    panel = X2[:128]                            # (128, 128)
    sr = jnp.asarray(rng.integers(0, 128, (nel // 128, 128))
                     .astype(np.int32))

    def onehot_rows(a):
        oh = (sr[..., None] == jnp.arange(128)[None, None, :]
              ).astype(jnp.float32)             # (G, 128, 128)
        return jnp.einsum("gij,jl->gil", oh, a,
                          precision=lax.Precision.DEFAULT)

    timeit("one-hot sublane (batched MXU)", onehot_rows, panel, nel)

    # 5. two-stage: one-hot rows then lane-select the diagonal element
    l2 = jnp.asarray(rng.integers(0, 128, (nel // 128, 128))
                     .astype(np.int32))

    def onehot_then_lane(a):
        oh = (sr[..., None] == jnp.arange(128)[None, None, :]
              ).astype(jnp.float32)
        rowsel = jnp.einsum("gij,jl->gil", oh, a,
                            precision=lax.Precision.DEFAULT)
        lsel = (l2[..., None] == jnp.arange(128)[None, None, :]
                ).astype(jnp.float32)
        return jnp.sum(rowsel * lsel, axis=-1)

    timeit("one-hot 2-stage (full gather)", onehot_then_lane, panel, nel)

    # 6. Pallas: x resident in VMEM, take inside the kernel
    from jax.experimental import pallas as pl

    def pl_take(a):
        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take(x_ref[...].reshape(-1),
                                  i_ref[...], axis=0)
        try:
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((nel // 128, 128),
                                               jnp.float32),
            )(a, cols.reshape(nel // 128, 128))
        except Exception as e:  # noqa: BLE001
            print("pallas take: build failed:", str(e)[:200])
            raise

    try:
        timeit("pallas in-VMEM jnp.take", pl_take, X2, nel)
    except Exception as e:  # noqa: BLE001
        print(f"pallas in-VMEM jnp.take          UNSUPPORTED "
              f"({type(e).__name__})", flush=True)

    # 6b. Pallas: take_along_axis lanes inside the kernel
    def pl_tal(a):
        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...],
                                             axis=1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nrows2, 128), jnp.float32),
        )(a, lidx)

    try:
        timeit("pallas take_along_axis lanes", pl_tal, X2, n)
    except Exception as e:  # noqa: BLE001
        print(f"pallas take_along_axis lanes     UNSUPPORTED "
              f"({type(e).__name__})", flush=True)

    print(f"(platform={jax.devices()[0].platform}, n={n}, {nel} el/pass)")


if __name__ == "__main__":
    main()
