"""Pallas TPU kernel for the basis rotation ``V <- Q^T V`` — the dsapps
``V*Q`` update (SRC/dsapps.f:452-501) on the 3-D per-row-tiled basis
layout (core/arnoldi.FactorizationState).

Measured motivation (benchmarks/bench_dus2.py, v5e): XLA lowers the
(ncv, ncv) x (ncv, npan, 128) contraction at ~275 GB/s — 0.35 of the HBM
roofline for what is a pure streaming pass (V read once, written once,
Q is 4 KB).  This kernel streams V through VMEM in (ncv, P, 128) panel
blocks and rotates each with ONE (ncv, ncv)@(ncv, P*128) MXU matmul per
grid step; Mosaic double-buffers the sequential grid, so the pass runs
at the copy roofline.

This is exactly the fusion class the round-1 retrospective said CAN pay
(docs/PERF.md): the rotation has no XLA fusion neighbors to lose (its
output is loop-carried), so the pallas_call barrier costs nothing, and
the kernel removes no passes but fixes a 3x-below-roofline lowering.

Used by core/arnoldi.rotate_basis on TPU for unsharded 3-D float32/bf16
bases; everything else keeps the XLA contraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128
#: panels per grid step (VMEM block = 2 * ncv * P * 128 * itemsize)
DEFAULT_PANELS = 8


def _i32(*vals):
    """Index-map components pinned to int32: under ``jax_enable_x64``
    weak-typed index scalars become i64, which Mosaic refuses to
    legalize ("failed to legalize operation 'func.return'" — measured
    round 4, fixed round 5; the cast makes the same kernel compile and
    validate on-TPU in an x64 process)."""
    return tuple(jnp.int32(v) for v in vals)


@functools.lru_cache(maxsize=None)
def make_rotate(ncv: int, npan: int, v_dtype: str, acc_dtype: str,
                panels: int = DEFAULT_PANELS, interpret: bool = False):
    """Build ``rotate(q, V) -> Q^T V`` over a (ncv, npan, 128) basis.

    ``q`` must already be in the basis storage dtype (bf16 inputs hit the
    MXU's native bf16 x bf16 -> f32 path); accumulation is ``acc_dtype``.
    """
    vdt = jnp.dtype(v_dtype)
    adt = jnp.dtype(acc_dtype)
    # Mosaic requires the block's last-two dims divisible by (8, 128):
    # the panel dim sits in sublane position, so P must be a multiple
    # of 8 (and divide npan)
    P = panels
    while P >= 8 and npan % P:
        P -= 8
    if P < 8 or npan % P:
        raise ValueError(f"npan={npan} needs a multiple-of-8 panel block")
    grid = (npan // P,)

    # precision: f32 operands need the HIGHEST pin (the default
    # truncates MXU inputs toward bf16 — the ghost-Ritz failure,
    # docs/PERF.md round-4); bf16 operands are exact on the MXU and
    # Mosaic REJECTS an fp32-precision pin on them ("Bad lhs type")
    prec = (jax.lax.Precision.HIGHEST
            if vdt == jnp.dtype(jnp.float32) else
            jax.lax.Precision.DEFAULT)

    def kernel(q_ref, v_ref, o_ref):
        q = q_ref[...]                     # (ncv, ncv)
        blk = v_ref[...].reshape(ncv, P * LANE)
        out = jax.lax.dot_general(q, blk, (((0,), (0,)), ((), ())),
                                  preferred_element_type=adt,
                                  precision=prec)
        o_ref[...] = out.reshape(ncv, P, LANE).astype(vdt)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ncv, ncv), lambda i: _i32(0, 0)),
                  pl.BlockSpec((ncv, P, LANE), lambda i: _i32(0, i, 0))],
        out_specs=pl.BlockSpec((ncv, P, LANE), lambda i: _i32(0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((ncv, npan, LANE), vdt),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def make_rotate_rows(ncv: int, rows: int, npan: int, v_dtype: str,
                     acc_dtype: str, panels: int = DEFAULT_PANELS,
                     interpret: bool = False):
    """Build the IN-PLACE kev-row restart rotation: ``rot(q, V) -> V'``
    with ``V'[:rows] = (Q[:, :rows])^T V`` and ``V'[rows:]`` the ORIGINAL
    buffer contents (``input_output_aliases`` — V is donated into the
    output, rows past ``rows`` are simply never touched).

    Why a kernel (measured, round 4): expressing this as
    ``dot + dynamic_update_slice`` makes XLA's layout assignment pick a
    ``{2,0,1}`` layout for the basis inside the fused-cycle while-loop
    and insert full-V layout-conversion copies — costing more than the
    partial rotation saves.  The kernel pins the standard layout and
    writes exactly (ncv reads + rows writes) rows of traffic, the
    dsapps-parity minimum (SRC/dsapps.f:445-481).

    Safety of the alias: grid steps stream disjoint panel groups; each
    step loads its (ncv, P, 128) input block to VMEM before storing its
    (rows, P, 128) output block over the same panels, and prefetch of
    step i+1 touches panels step i does not store.
    """
    vdt = jnp.dtype(v_dtype)
    adt = jnp.dtype(acc_dtype)
    P = panels
    while P >= 8 and npan % P:
        P -= 8
    if P < 8 or npan % P:
        raise ValueError(f"npan={npan} needs a multiple-of-8 panel block")
    grid = (npan // P,)

    prec = (jax.lax.Precision.HIGHEST
            if vdt == jnp.dtype(jnp.float32) else
            jax.lax.Precision.DEFAULT)  # see make_rotate precision note

    def kernel(q_ref, v_ref, o_ref):
        q = q_ref[...]                     # (ncv, rows)
        blk = v_ref[...].reshape(ncv, P * LANE)
        out = jax.lax.dot_general(q, blk, (((0,), (0,)), ((), ())),
                                  preferred_element_type=adt,
                                  precision=prec)
        o_ref[...] = out.reshape(rows, P, LANE).astype(vdt)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ncv, rows), lambda i: _i32(0, 0)),
                  pl.BlockSpec((ncv, P, LANE), lambda i: _i32(0, i, 0))],
        out_specs=pl.BlockSpec((rows, P, LANE), lambda i: _i32(0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((ncv, npan, LANE), vdt),
        input_output_aliases={1: 0},
        interpret=interpret,
    )


def supported(V, q_dtype) -> bool:
    """Kernel applicability: 3-D real f32/bf16 basis (the TPU layouts)."""
    return (V.ndim == 3 and V.shape[2] == LANE
            and jnp.dtype(V.dtype) in (jnp.dtype(jnp.float32),
                                       jnp.dtype(jnp.bfloat16))
            and not jnp.issubdtype(jnp.dtype(q_dtype), jnp.complexfloating))
