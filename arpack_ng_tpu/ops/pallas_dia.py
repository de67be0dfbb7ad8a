"""Pallas TPU kernel for DIA (diagonal-set) SpMV — the hand-scheduled
version of :func:`ops.sparse.dia_matvec_fn`.

TPU vector memory only supports *aligned* vector loads (Mosaic rejects a
``pl.ds(base + 1, tile)`` read), so arbitrary diagonal shifts are realized
with the canonical TPU stencil scheme:

* x is viewed 2-D as ``(rows, 128)`` lanes and kept fully VMEM-resident
  (padded by one aligned halo row block on each side);
* a shift by ``d = q*128 + r`` reads TWO aligned row-blocks (rows offset
  by q and q+1), lane-``roll``s each by ``-r``, and lane-selects between
  them — every load aligned, every op a plain VPU vector op;
* per output tile the kernel then fuses one multiply-accumulate per
  structural diagonal against the streamed diagonal table.

Traffic: diagonal table once (dominant), x twice per diagonal from VMEM
(free), y once — the HBM-bandwidth optimum.  Offsets are compile-time
constants, so the whole kernel unrolls into straight-line vector code.

Used for TPU execution when the x vector fits the VMEM budget; the XLA
shift-multiply fallback (ops/sparse.dia_matvec_fn) covers larger problems
and other backends.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: per-dtype VMEM budget for the resident x slab (bytes)
_X_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fits_vmem(n_pad: int, dtype) -> bool:
    return n_pad * np.dtype(dtype).itemsize <= _X_VMEM_BUDGET


def make_pallas_dia_matvec(offsets: Sequence[int], diags, n: int,
                           n_pad: int, *, tile_rows: int = 64,
                           interpret: bool = False):
    """Build ``matvec(x)`` over padded vectors (length n_pad, a multiple
    of 128).  ``diags[k][i] = A[i, i + offsets[k]]`` (row-aligned)."""
    offsets = [int(d) for d in offsets]
    nd = len(offsets)
    dtype = np.dtype(np.asarray(diags[0]).dtype)
    if n_pad % LANE != 0:
        raise ValueError("n_pad must be a multiple of 128")
    rows = n_pad // LANE
    # halo rows so every q / q+1 row read stays in-bounds
    halo = _round_up(max((abs(d) for d in offsets), default=0) + LANE,
                     LANE) // LANE
    while rows % tile_rows != 0:
        tile_rows //= 2
    grid = rows // tile_rows

    dtab = np.zeros((nd, n_pad), dtype)
    for k, (d, diag) in enumerate(zip(offsets, diags)):
        v = np.asarray(diag, dtype)
        dtab[k, : v.shape[0]] = v
        dtab[k, n:] = 0
    dtab_dev = jnp.asarray(dtab.reshape(nd, rows, LANE))

    def kernel(xp_ref, dtab_ref, y_ref):
        i = pl.program_id(0)
        base = halo + i * tile_rows       # first x-row of this tile
        acc = jnp.zeros((tile_rows, LANE), dtype)
        for k, d in enumerate(offsets):
            q, r = divmod(d, LANE)        # python divmod: 0 <= r < 128
            a = xp_ref[pl.ds(base + q, tile_rows), :]
            if r == 0:
                shifted = a
            else:
                b = xp_ref[pl.ds(base + q + 1, tile_rows), :]
                ra = pltpu.roll(a, LANE - r, axis=1)
                rb = pltpu.roll(b, LANE - r, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32,
                                                (tile_rows, LANE), 1)
                shifted = jnp.where(lane < LANE - r, ra, rb)
            acc = acc + dtab_ref[k, :, :] * shifted
        y_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            # x (2-D, halo-padded) resident whole in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # diagonal table streamed tile-by-tile (the dominant traffic)
            pl.BlockSpec((nd, tile_rows, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), dtype),
        interpret=interpret,
    )

    def matvec(x):
        x2 = x.reshape(rows, LANE)
        xp = jnp.zeros((rows + 2 * halo, LANE), x.dtype)
        xp = xp.at[halo: halo + rows, :].set(x2)
        return call(xp, dtab_dev).reshape(-1)

    return matvec
