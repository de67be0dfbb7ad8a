"""Scalar-prefetch Pallas kernels for the eta-subset reorthogonalization
EVENT: one CGS pass pair against K *indexed* basis rows, reading the rows
directly from the (ncv, npan, 128) basis by index — no gather
materialization.

Reference semantics: each event realizes the dsaitr reorthogonalization
pass (SRC/dsaitr.f:656-781) restricted to the eta-selected rows (the
Larsen/PROPACK subset; core/arnoldi._step_pro).

Measured motivation (benchmarks/bench_sel_gather.py): the XLA lowering
of ``jnp.take(V, idx) -> proj -> update`` costs a ~150 us FIXED price
per event (the K-row gather materializes to HBM before the contraction
streams it back) plus ~13 us/row — the largest remaining item between
the flagship wall and its measured-achievable wall (BENCH_r04
``vs_achievable = 0.52``; docs/PERF.md round-4).  Here the row index
vector rides ``PrefetchScalarGridSpec`` and the BlockSpec index maps
read ``idx_ref[k]`` to stream row ``idx[k]`` panel-by-panel straight
from the basis: the event costs exactly (K reads + K reads + r
read/write) of row traffic and two kernel launches.

Kernel structure (second design; the first was measured latency-bound):
the grid runs over PANELS only, and each of the K selected rows gets its
own BlockSpec — so each grid step issues K+1 independent block DMAs
(which Mosaic double-buffers across the sequential grid) and performs
ONE (K, P*128)-shaped MXU contraction.  The first design ran a
(panels, K) grid of single-row steps: 0.5 us of per-step overhead on
~500 steps measured 68-90 GB/s delivered — WORSE than the take path.
Per-row BlockSpecs cut the step count K-fold and turn the row loop into
parallel DMAs.

The projection accumulator is the output block with a constant index
map (resident in VMEM for the whole kernel, written back once — the
Pallas revisiting rule).  The update kernel aliases ``r`` into its
output (``input_output_aliases``) and optionally carries ``||r'||^2``
out of the same pass (the XLA epilogue fusion a pallas_call otherwise
loses — same reasoning as ops/pallas_cgs.make_update with_norm).

All index scalars are int32 (works in ``jax_enable_x64`` processes; i64
index-map scalars are the Mosaic legalization failure that gated the
round-4 rotation kernel off under x64 — ops/pallas_rot._i32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: panels per grid step (VMEM per V row block = P * 128 * itemsize)
DEFAULT_PANELS = 64


def _i32(*vals):
    """Index-map components pinned to int32 (Mosaic rejects i64 index
    scalars under jax_enable_x64 — see ops/pallas_rot._i32)."""
    return tuple(jnp.int32(v) for v in vals)


def _pick_panels(npan: int, panels: int) -> int:
    P = min(panels, npan)
    while P >= 8 and npan % P:
        P -= 8
    if P < 8 or npan % P:
        raise ValueError(f"npan={npan} needs a multiple-of-8 panel block")
    return P


def _row_spec(k, P):
    """BlockSpec streaming panels of basis row ``idx[k]`` (one spec per
    selected row; ``k`` is a Python constant per spec)."""
    return pl.BlockSpec((1, P, LANE),
                        functools.partial(
                            lambda p, idx_ref, kk: _i32(idx_ref[kk], p, 0),
                            kk=k))


def _row_spec2(k, P):
    """Same, for kernels with two scalar-prefetch arguments."""
    return pl.BlockSpec((1, P, LANE),
                        functools.partial(
                            lambda p, i_ref, s_ref, kk:
                            _i32(i_ref[kk], p, 0),
                            kk=k))


@functools.lru_cache(maxsize=None)
def make_sel_proj(K: int, ncv: int, npan: int, v_dtype: str,
                  acc_dtype: str, panels: int = DEFAULT_PANELS,
                  interpret: bool = False):
    """Build ``proj(idx, V, br) -> s`` with ``s[k] = <V[idx[k]], br>``.

    ``idx``: (K,) int32 row indices (values in [0, ncv)); ``V``:
    (ncv, npan, 128) basis; ``br``: (n,) vector; returns ``s``: (K,) in
    ``acc_dtype``.
    """
    vdt = jnp.dtype(v_dtype)
    adt = jnp.dtype(acc_dtype)
    P = _pick_panels(npan, panels)
    NB = npan // P

    def kernel(idx_ref, *refs):
        vrefs, b_ref, s_ref = refs[:K], refs[K], refs[K + 1]
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        bb = b_ref[...].astype(adt)
        # K unrolled VPU reductions (one per selected row block)
        parts = [jnp.sum(v[...].reshape(P, LANE).astype(adt) * bb)
                 for v in vrefs]
        s_ref[...] += jnp.stack(parts).reshape(K, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=([_row_spec(k, P) for k in range(K)]
                  + [pl.BlockSpec((P, LANE), lambda p, idx_ref: _i32(p, 0))]),
        out_specs=pl.BlockSpec((K, 1), lambda p, idx_ref: _i32(0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 1), adt),
        interpret=interpret,
    )

    def proj(idx, V, br):
        idx = idx.astype(jnp.int32)
        br = br.reshape(npan, LANE).astype(vdt)
        return call(idx, *([V] * K), br)[:, 0]

    return proj


@functools.lru_cache(maxsize=None)
def make_sel_update(K: int, ncv: int, npan: int, v_dtype: str,
                    acc_dtype: str, panels: int = DEFAULT_PANELS,
                    with_norm: bool = False, interpret: bool = False):
    """Build ``update(idx, s, r, V) -> r - sum_k s[k] * V[idx[k]]``
    (optionally also ``||r'||^2``), with ``r`` donated in place.

    ``s`` rides scalar prefetch (SMEM) alongside ``idx``; masked-out
    rows must arrive with ``s[k] == 0`` (the caller applies the valid
    mask — a zero coefficient makes the streamed stale row a no-op).
    """
    vdt = jnp.dtype(v_dtype)
    adt = jnp.dtype(acc_dtype)
    P = _pick_panels(npan, panels)
    NB = npan // P
    r_arg = K + 1  # operand position of r: (idx, s, r, V*K)

    def body(s_ref, r_ref, vrefs, o_ref):
        # K unrolled VPU FMAs (scalar coefficient x row block)
        acc = r_ref[...].astype(adt)
        for k in range(K):
            acc = acc - s_ref[k] * vrefs[k][...].reshape(P, LANE).astype(adt)
        o_ref[...] = acc
        return acc

    if with_norm:
        def kernel(idx_ref, s_ref, r_ref, *refs):
            vrefs = refs[:K]
            o_ref, n_ref = refs[K], refs[K + 1]
            acc_ref = refs[K + 2]
            p = pl.program_id(0)
            out = body(s_ref, r_ref, vrefs, o_ref)
            psum = jnp.sum(out * out)

            @pl.when(p == 0)
            def _():
                acc_ref[0] = psum

            @pl.when(p > 0)
            def _():
                acc_ref[0] += psum

            @pl.when(p == NB - 1)
            def _():
                n_ref[0, 0] = acc_ref[0]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NB,),
            in_specs=([pl.BlockSpec((P, LANE),
                                    lambda p, i, s: _i32(p, 0))]
                      + [_row_spec2(k, P) for k in range(K)]),
            out_specs=[
                pl.BlockSpec((P, LANE), lambda p, i, s: _i32(p, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.SMEM((1,), adt)],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((npan, LANE), adt),
                       jax.ShapeDtypeStruct((1, 1), adt)),
            input_output_aliases={2: 0},  # r (compute dtype) -> out
            interpret=interpret,
        )

        def update(idx, s, r, V):
            r2, nrm = call(idx.astype(jnp.int32), s.astype(adt),
                           r.reshape(npan, LANE).astype(adt), *([V] * K))
            return r2.reshape(-1), nrm[0, 0]

        return update

    def kernel(idx_ref, s_ref, r_ref, *refs):
        vrefs, o_ref = refs[:K], refs[K]
        body(s_ref, r_ref, vrefs, o_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=([pl.BlockSpec((P, LANE), lambda p, i, s: _i32(p, 0))]
                  + [_row_spec2(k, P) for k in range(K)]),
        out_specs=pl.BlockSpec((P, LANE), lambda p, i, s: _i32(p, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npan, LANE), adt),
        input_output_aliases={2: 0},  # r (compute dtype) -> out
        interpret=interpret,
    )

    def update(idx, s, r, V):
        r2 = call(idx.astype(jnp.int32), s.astype(adt),
                  r.reshape(npan, LANE).astype(adt), *([V] * K))
        return r2.reshape(-1)

    return update
