"""PSELL: panel-tiled sliced-ELL SpMV kernel for IRREGULAR sparsity.

The round-4 corpus measurement (docs/PERF.md) put the gather formats at
0.05 Gnnz/s on FEM/power-law matrices — ~20 ns per element, the cost of
XLA's serial gather — against 5.1 Gnnz/s for DIA streaming on the same
chip.  The reference's users run the same matrices at CPU STREAM
bandwidth through plain CSR (EXAMPLES/MATRIX_MARKET/arpackSolver.hpp:233,
TESTS/dnsimp.f:192-194); this kernel is the TPU-native answer (round-4
verdict #2), building on the measured primitive costs
(benchmarks/bench_gather_primitives.py): element gathers are serial, but
one-hot contractions against a VMEM-resident 128x128 panel run on the
MXU at streaming speed.

Format (packed on host, ``pack_psell``):

* x is viewed as PANELS of 16384 elements (128 sublanes x 128 lanes);
  y as CHUNKS of 1024 elements (8 x 128 output tile).
* nonzeros are grouped by (chunk, panel) and padded to tiles of T=1024
  entries; tiles are sorted by (chunk, panel) so each output block is
  revisited consecutively (accumulated in VMEM) and each x panel is
  fetched once per group.
* per entry: value (f32) + ONE packed int32
  ``sub(3) | lane_o(7) | sr(7) | lane(7)`` — the entry reads
  ``x[panel, sr, lane]`` and accumulates into ``y[chunk, sub, lane_o]``.
  8 bytes/nonzero of streamed metadata, the CSR cost.

Kernel (grid over tiles, scalar-prefetched panel/chunk ids):

1. gather stage: ``onehot(sr) @ x_panel`` — a (T,128)x(128,128) MXU
   contraction selects each entry's source sub-row; a lane one-hot
   reduction selects the element.  No serial gather anywhere.
2. scatter stage: per output sub-row s, ``(z * [sub==s]) @ onehot(lane_o)``
   — 8 masked (1,T)x(T,128) MXU GEMVs accumulate the tile into the
   (8,128) output block.

Traffic per matvec: 8 B/nnz metadata + one 64 KB x-panel fetch per
(chunk, panel) group + one 4 KB y block write per chunk — bandwidth-
bound for any matrix whose chunks touch a bounded number of panels
(locality delivered by RCM or degree sorting at import, ops/sparse.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

LANE = 128
#: x panel: PANEL_SUB x LANE elements
PANEL_SUB = 128
PANEL = PANEL_SUB * LANE           # 16384
#: y chunk: CHUNK_SUB x LANE elements
CHUNK_SUB = 8
CHUNK = CHUNK_SUB * LANE           # 1024
#: entries per tile (one (8, 128) metadata block)
TILE = 1024


class PSell(NamedTuple):
    """Packed panel-tiled sliced-ELL matrix (host arrays)."""

    vals: np.ndarray      # (ntiles, 8, 128) float32/float64 values
    meta: np.ndarray      # (ntiles, 8, 128) int32 packed coordinates
    p_idx: np.ndarray     # (ntiles,) int32 x-panel index per tile
    c_idx: np.ndarray     # (ntiles,) int32 y-chunk index per tile
    first: np.ndarray     # (ntiles,) int32 1 = first tile of its chunk
    n: int                # logical dimension
    n_pad: int            # padded dimension (multiple of CHUNK)
    nnz: int              # true nonzero count


def pack_psell(a, n_pad: int = 0) -> PSell:
    """Pack a scipy sparse matrix into PSELL tiles (see module doc)."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(a)
    n = csr.shape[0]
    if n_pad == 0:
        n_pad = -(-n // CHUNK) * CHUNK
    if n_pad % CHUNK:
        raise ValueError(f"n_pad must be a multiple of {CHUNK}")
    coo = csr.tocoo()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data
    g = r // CHUNK
    q = c // PANEL
    sub = (r % CHUNK) // LANE
    lane_o = r % LANE
    sr = (c % PANEL) // LANE
    lane = c % LANE
    meta_e = ((sub.astype(np.int64) << 21) | (lane_o << 14) | (sr << 7)
              | lane).astype(np.int32)

    # sort entries by (chunk, panel); pad each group to TILE multiples
    order = np.lexsort((q, g))
    g, q, v, meta_e = g[order], q[order], v[order], meta_e[order]
    gq = g * (n_pad // PANEL + 1) + q
    _, group_start = np.unique(gq, return_index=True)
    group_start = np.sort(group_start)
    group_sizes = np.diff(np.append(group_start, len(gq)))
    tiles_per_group = -(-group_sizes // TILE)

    n_chunks = n_pad // CHUNK
    # empty chunks need one zero tile so every output block is written
    chunks_with = np.unique(g)
    empty_chunks = np.setdiff1d(np.arange(n_chunks), chunks_with)
    ntiles = int(tiles_per_group.sum()) + len(empty_chunks)

    vals = np.zeros((ntiles, TILE), dtype=v.dtype)
    meta = np.zeros((ntiles, TILE), dtype=np.int32)
    p_idx = np.zeros(ntiles, np.int32)
    c_idx = np.zeros(ntiles, np.int32)
    first = np.zeros(ntiles, np.int32)

    t = 0
    prev_chunk = -1
    for gs, sz, tg in zip(group_start, group_sizes, tiles_per_group):
        chunk = int(g[gs])
        panel = int(q[gs])
        for j in range(tg):
            lo = gs + j * TILE
            hi = min(gs + (j + 1) * TILE, gs + sz)
            m = hi - lo
            vals[t, :m] = v[lo:hi]
            meta[t, :m] = meta_e[lo:hi]
            p_idx[t] = panel
            c_idx[t] = chunk
            first[t] = 1 if chunk != prev_chunk else 0
            prev_chunk = chunk
            t += 1
    for ch in empty_chunks:
        c_idx[t] = ch
        first[t] = 1
        # p_idx 0, vals 0: a no-op tile that zero-initializes the chunk
        t += 1
    assert t == ntiles
    # order tiles by chunk so output blocks are revisited consecutively
    # (empty-chunk tiles were appended; re-sort and recompute `first`)
    ordt = np.argsort(c_idx, kind="stable")
    vals, meta = vals[ordt], meta[ordt]
    p_idx, c_idx = p_idx[ordt], c_idx[ordt]
    first = np.zeros(ntiles, np.int32)
    first[np.unique(c_idx, return_index=True)[1]] = 1
    return PSell(vals=vals.reshape(ntiles, CHUNK_SUB * 1, TILE // CHUNK_SUB
                                   ).reshape(ntiles, 8, 128),
                 meta=meta.reshape(ntiles, 8, 128),
                 p_idx=p_idx, c_idx=c_idx, first=first,
                 n=n, n_pad=n_pad, nnz=int(csr.nnz))


class PSellU(NamedTuple):
    """Uniform-W PSELL packing: a dense (chunks, W) grid of tiles.

    Padding every chunk to the same tile count W turns the per-tile
    scatter into a dense ``sum over W`` — no scatter-add and no Pallas
    revisiting protocol — so the whole matvec is expressible as two
    batched one-hot einsums that XLA fuses (measured 0.6 ns/element,
    benchmarks/bench_gather_primitives.py).  The Mosaic kernel variant
    (``make_psell_matvec``) measured 3-5 us/tile of op-latency on the
    same algebra (rank-3 one-hot dots serialize; docs/PERF.md round-5),
    so this XLA form is the production path.
    """

    vals: np.ndarray      # (C*W, TILE)
    meta: np.ndarray      # (C*W, TILE) int32 packed (see pack_psell)
    p_idx: np.ndarray     # (C*W,) int32 x-panel per tile
    W: int
    n: int
    n_pad: int            # multiple of CHUNK
    nnz: int


def pack_psell_uniform(a, n_pad: int = 0) -> PSellU:
    """Pack into the uniform-W (chunks x W tiles) grid (see PSellU)."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(a)
    n = csr.shape[0]
    if n_pad == 0:
        n_pad = -(-n // CHUNK) * CHUNK
    if n_pad % CHUNK:
        raise ValueError(f"n_pad must be a multiple of {CHUNK}")
    coo = csr.tocoo()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data
    g = r // CHUNK
    q = c // PANEL
    meta_e = ((((r % CHUNK) // LANE) << 21) | ((r % LANE) << 14)
              | (((c % PANEL) // LANE) << 7) | (c % LANE)).astype(np.int32)
    order = np.lexsort((q, g))
    g, q, v, meta_e = g[order], q[order], v[order], meta_e[order]
    nch = n_pad // CHUNK
    qwidth = n_pad // PANEL + 2
    gq = g * qwidth + q
    uq, start = np.unique(gq, return_index=True)
    start = np.sort(start)
    sizes = np.diff(np.append(start, len(gq)))
    tpg = -(-sizes // TILE)
    tiles_per_chunk = np.zeros(nch, np.int64)
    np.add.at(tiles_per_chunk, (gq[start] // qwidth), tpg)
    W = max(int(tiles_per_chunk.max()), 1)
    vals = np.zeros((nch * W, TILE), dtype=v.dtype)
    meta = np.zeros((nch * W, TILE), dtype=np.int32)
    p_idx = np.zeros(nch * W, np.int32)
    slot = np.zeros(nch, np.int64)
    for gs, sz in zip(start, sizes):
        chunk = int(g[gs])
        panel = int(q[gs])
        for j in range(-(-sz // TILE)):
            lo = gs + j * TILE
            m = min(TILE, gs + sz - lo)
            t = chunk * W + slot[chunk]
            vals[t, :m] = v[lo:lo + m]
            meta[t, :m] = meta_e[lo:lo + m]
            p_idx[t] = panel
            slot[chunk] += 1
    return PSellU(vals=vals, meta=meta, p_idx=p_idx, W=W, n=n,
                  n_pad=n_pad, nnz=int(csr.nnz))


def make_psell_matvec_xla(C: int, W: int, n_pad: int, dtype: str):
    """Pure-XLA uniform-W PSELL matvec (see PSellU): two batched
    one-hot contractions, dense W-sum, no gather ops anywhere except
    one 64 KB panel fetch per tile."""
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    npanels = -(-n_pad // PANEL)
    hi = jax.lax.Precision.HIGHEST
    i128 = np.arange(LANE, dtype=np.int32)
    i8 = np.arange(CHUNK_SUB, dtype=np.int32)

    def matvec(vals, meta, p_idx, x):
        full = npanels * PANEL
        if full != n_pad:
            x = jnp.pad(x, (0, full - n_pad))
        X3 = x.reshape(npanels, PANEL_SUB, LANE)
        xp = X3[p_idx]                               # (T,128,128)
        lane = meta & 0x7F
        sr = (meta >> 7) & 0x7F
        lane_o = (meta >> 14) & 0x7F
        sub = (meta >> 21) & 0x7
        oh_sr = (sr[:, :, None] == i128).astype(dt)  # (T,TILE,128)
        rowsel = jnp.einsum("tns,tsl->tnl", oh_sr, xp.astype(dt),
                            precision=hi)
        gsel = jnp.sum(rowsel * (lane[:, :, None] == i128).astype(dt),
                       axis=-1) * vals.astype(dt)    # (T,TILE)
        gs = gsel[:, :, None] * (sub[:, :, None] == i8).astype(dt)
        oh_lo = (lane_o[:, :, None] == i128).astype(dt)
        ytile = jnp.einsum("tns,tnl->tsl", gs, oh_lo,
                           precision=hi)             # (T,8,128)
        y = ytile.reshape(C, W, CHUNK_SUB, LANE).sum(axis=1)
        return y.reshape(-1)

    return matvec


@functools.lru_cache(maxsize=None)
def make_psell_matvec(ntiles: int, n_pad: int, dtype: str,
                      interpret: bool = False):
    """Build ``matvec(vals, meta, p_idx, c_idx, first, x) -> y`` over a
    packed PSELL matrix (shapes static per ``ntiles``/``n_pad``)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(dtype)
    npanels = -(-n_pad // PANEL)     # x padded up to whole panels
    nchunks = n_pad // CHUNK

    def _i32(*vals):
        return tuple(jnp.int32(v) for v in vals)

    def kernel(pidx_ref, cidx_ref, first_ref, v_ref, m_ref, x_ref, o_ref):
        t = pl.program_id(0)
        m = m_ref[...].reshape(CHUNK_SUB, LANE)   # (8, 128) i32
        v = v_ref[...].reshape(CHUNK_SUB, LANE).astype(dt)
        lane = m & 0x7F
        sr = (m >> 7) & 0x7F
        lane_o = (m >> 14) & 0x7F
        sub = (m >> 21) & 0x7
        xp = x_ref[...].reshape(PANEL_SUB, LANE).astype(dt)  # (128,128)
        # all 8 metadata rows processed in BATCHED ops: a first version
        # unrolled a python loop of (128,128) dots chained through the
        # accumulator and measured 4.7 us/tile of op-latency; the
        # batched dot_generals below issue the same FLOPs as single ops.
        iota3 = jax.lax.broadcasted_iota(jnp.int32,
                                         (CHUNK_SUB, LANE, LANE), 2)
        # stage 1: gather — batched one-hot row select then lane select
        oh_sr = (sr[:, :, None] == iota3).astype(dt)    # (8,128e,128srf)
        rowsel = jax.lax.dot_general(
            oh_sr, xp, (((2,), (0,)), ((), ())),
            preferred_element_type=dt)                  # (8,128e,128l)
        oh_ln = (lane[:, :, None] == iota3).astype(dt)
        z = jnp.sum(rowsel * oh_ln, axis=2) * v         # (8,128)
        # stage 2: scatter — w[r,s,j] = z[r,j] iff sub[r,j]==s, then one
        # batched (8r; 8s,128j)@(8r; 128j,128lo) contraction + batch sum
        iota_s = jax.lax.broadcasted_iota(jnp.int32,
                                          (CHUNK_SUB, CHUNK_SUB, LANE), 1)
        w = jnp.where(sub[:, None, :] == iota_s, z[:, None, :],
                      jnp.zeros((), dt))                # (8r,8s,128j)
        oh_lo = (lane_o[:, :, None] == iota3).astype(dt)  # (8r,128j,128lo)
        contrib = jax.lax.dot_general(
            w, oh_lo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt)                  # (8r,8s,128lo)
        contrib = jnp.sum(contrib, axis=0)              # (8,128)

        @pl.when(first_ref[t] == 1)
        def _():
            o_ref[...] = contrib.reshape(1, CHUNK_SUB, LANE)

        @pl.when(first_ref[t] == 0)
        def _():
            o_ref[...] += contrib.reshape(1, CHUNK_SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, 128),
                         lambda t, p, c, f: _i32(t, 0, 0)),   # vals
            pl.BlockSpec((1, 8, 128),
                         lambda t, p, c, f: _i32(t, 0, 0)),   # meta
            pl.BlockSpec((1, PANEL_SUB, LANE),
                         lambda t, p, c, f: _i32(p[t], 0, 0)),  # x panel
        ],
        out_specs=pl.BlockSpec((1, CHUNK_SUB, LANE),
                               lambda t, p, c, f: _i32(c[t], 0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks, CHUNK_SUB, LANE), dt),
        interpret=interpret,
    )

    def matvec(vals, meta, p_idx, c_idx, first, x):
        full = npanels * PANEL
        if full != n_pad:
            x = jnp.pad(x, (0, full - n_pad))
        xv = x.reshape(npanels, PANEL_SUB, LANE)
        y = call(p_idx, c_idx, first, vals, meta, xv)
        return y.reshape(-1)

    return matvec
