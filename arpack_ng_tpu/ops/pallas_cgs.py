"""Pallas TPU kernels for the CGS orthogonalization passes — the
hand-scheduled variants of the two hot GEMVs of the Arnoldi step
(SRC/dsaitr.f:570-583's dgemv pair, rebuilt for TPU streaming).

Measured motivation (benchmarks/bench_gemv.py, v5e): XLA's GEMV lowering
for the solver shapes ((rows<=32) x n contractions, n ~ 1M) sustains only
~50-55%% of HBM speed-of-light per pass, with a ~0.1-0.2 ms fixed cost
per pass that dominates at small row counts.  These kernels stream V in
(rows, tile, 128) blocks with a VMEM accumulator that persists across
the sequential TPU grid, so each pass is a single straight-line
multiply-accumulate loop at the bandwidth roofline.

* :func:`make_proj` — ``h = V[:rows] @ w``: per grid step accumulates
  ``sum_t V[:, t, :] * w[t, :]`` into a (rows, 128) VMEM accumulator;
  the final 128-lane reduction happens outside (tiny, fused by XLA).
* :func:`make_update` — ``r = w - h @ V[:rows]``: per grid step a
  statically-unrolled loop of rank-1 lane-broadcast multiply-subtracts
  (h is replicated across lanes, so ``(1,128) * (tile,128)`` broadcasts
  realize the scalar multiply with aligned vector ops only).

Both kernels read the basis in its storage dtype and accumulate in the
compute dtype — the mixed-precision contract of
``IRAMConfig.storage_dtype`` (docs/PERF.md) is preserved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: measured crossover (benchmarks/bench_pallas_tune.py, v5e): these
#: kernels beat XLA's GEMV lowering up to 24 rows (1.1-1.3x); at 32 rows
#: Mosaic's schedule degrades ~2x below XLA, so callers should fall back
#: to the XLA contraction beyond this row count.
MAX_FAST_ROWS = 24


#: default tile: columns of V streamed per grid step (per 128-lane row);
#: scaled down at high row counts to bound the per-step VMEM block
#: (measured best: 32 at <=16 rows, 16 at 24 rows — bench_pallas_tune.py).
#: Both values satisfy bf16's 16-sublane minimum for the (tile, 128) dims.
def _default_tile(rows: int, v_dtype) -> int:
    return 16 if rows > 16 else 32


def _pick_tpl(npl: int, tpl: int) -> int:
    while npl % tpl:
        tpl //= 2
    return max(tpl, 1)


@functools.lru_cache(maxsize=None)
def make_proj(rows: int, total_rows: int, n_pad: int, v_dtype: str,
              acc_dtype: str, interpret: bool = False, tile: int = 0):
    """Build ``proj(V, w) -> h``: ``h = (V[:rows].conj() @ w)`` for real
    dtypes (conj is a no-op; complex uses the XLA path).

    ``V`` is the FULL ``(total_rows, n_pad)`` basis in storage dtype —
    the kernel's BlockSpec touches only the first ``rows`` row-blocks.
    Passing a ``V[:rows]`` slice instead would force XLA to materialize
    a copy of the slice for the custom call (slices fuse into XLA
    contractions but cannot fuse into a pallas_call): measured 1.7x
    END-TO-END slowdown from exactly that.  ``w`` is ``(n_pad,)`` in
    compute dtype; returns ``(rows,)`` in compute dtype."""
    if n_pad % LANE:
        raise ValueError("n_pad must be a multiple of 128")
    npl = n_pad // LANE
    tpl = _pick_tpl(npl, tile or _default_tile(rows, v_dtype))
    grid = npl // tpl
    vdt, adt = jnp.dtype(v_dtype), jnp.dtype(acc_dtype)

    def kernel(v_ref, w_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        v = v_ref[...].astype(adt)            # (rows, tpl, 128)
        w = w_ref[...].astype(adt)            # (tpl, 128)
        acc_ref[...] += jnp.sum(v * w[None, :, :], axis=1)

        @pl.when(i == grid - 1)
        def _():
            out_ref[...] = acc_ref[...]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, tpl, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpl, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), adt),
        scratch_shapes=[pltpu.VMEM((rows, LANE), adt)],
        interpret=interpret,
    )

    def proj(V, w):
        out = call(V.reshape(total_rows, npl, LANE), w.reshape(npl, LANE))
        return jnp.sum(out, axis=1)

    return proj


@functools.lru_cache(maxsize=None)
def make_update(rows: int, total_rows: int, n_pad: int, v_dtype: str,
                acc_dtype: str, interpret: bool = False, tile: int = 0,
                with_norm: bool = False):
    """Build ``update(w, h, V) -> w - h[:rows] @ V[:rows]`` (the CGS
    subtraction pass; also serves the DGKS refinement passes).  ``V`` is
    the full ``(total_rows, n_pad)`` basis (see :func:`make_proj` on why
    slicing outside the kernel is ruinous); ``h`` has length ``rows``.

    ``with_norm=True`` additionally returns ``||r||^2``, accumulated in
    the same pass — XLA fuses the norm reduction into its GEMV epilogue
    natively, but it cannot fuse INTO a pallas_call, so without this the
    Pallas path would pay an extra full read of r (plus a dispatch's
    fixed cost) per Arnoldi step for the ORTH1 norm (SRC/dsaitr.f:634)."""
    if n_pad % LANE:
        raise ValueError("n_pad must be a multiple of 128")
    npl = n_pad // LANE
    tpl = _pick_tpl(npl, tile or _default_tile(rows, v_dtype))
    grid = npl // tpl
    vdt, adt = jnp.dtype(v_dtype), jnp.dtype(acc_dtype)

    def kernel(h_ref, v_ref, w_ref, r_ref, *rest):
        v = v_ref[...]                         # (rows, tpl, 128) storage dt
        acc = w_ref[...].astype(adt)           # (tpl, 128)
        for k in range(rows):                  # static unroll over rows
            # h_ref[k] is lane-replicated: (1,128)*(tpl,128) broadcasts
            # the scalar across sublanes with aligned vector ops only
            acc = acc - h_ref[k:k + 1, :].astype(adt) * v[k].astype(adt)
        r_ref[...] = acc.astype(r_ref.dtype)
        if with_norm:
            n2_ref, n2_acc = rest
            i = pl.program_id(0)
            part = jnp.sum(acc * acc)

            @pl.when(i == 0)
            def _():
                n2_acc[0, 0] = part

            @pl.when(i > 0)
            def _():
                n2_acc[0, 0] += part

            @pl.when(i == grid - 1)
            def _():
                n2_ref[0, 0] = n2_acc[0, 0]

    out_specs = pl.BlockSpec((tpl, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((npl, LANE), adt)
    scratch = []
    if with_norm:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), adt))
        scratch = [pltpu.SMEM((1, 1), adt)]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tpl, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpl, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def update(w, h, V):
        h128 = jnp.broadcast_to(h[:, None], (rows, LANE))
        out = call(h128, V.reshape(total_rows, npl, LANE),
                   w.reshape(npl, LANE))
        if with_norm:
            r, n2 = out
            return r.reshape(n_pad), n2[0, 0]
        return out.reshape(n_pad)

    return update
