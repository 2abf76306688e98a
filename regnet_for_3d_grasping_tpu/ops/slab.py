"""Sorted-slab Pallas kernels: radius grouping, closing-region crop and
fused pooling that scan only each query tile's spatial slab.

The full-scan kernels (ops/group_pallas.py, ops/crop_pallas.py) and the
XLA bucket paths test every (query, point) pair: ~10^8 pairs per stage at
the 4000-center inference preset, all VPU work.  But both queries and
points live on a tabletop: a radius/box test can only pass for points
whose x-coordinate lies within a known bound of the query's.  This module
exploits that with ONE spatial sort per forward:

  * ``sort_cloud``        — order points by (x-cell, random-within-cell).
    The cell quantization keeps index order random *within* a cell, which
    preserves the sampling-diversity rationale of ops/sampling.
    bucket_choice at cell granularity (CLAUDE.md: "cloud index order is
    random").
  * ``group_slab`` / ``crop_slab`` — the grouping/crop kernels with a
    per-query-tile scan range [start, stop) over 2048-column blocks,
    computed exactly from the cell ids (scalar-prefetch block indices;
    out-of-range steps skip both compute and selection).  Counts are
    EXACT: any point outside the scanned slab provably fails the
    radius/box test.  Selection happens inside a per-tile span of
    contiguous windows so the output keeps a bucket structure the fused
    pooling can consume.
  * ``gather_max_slab``   — ops/pooling.gather_max for slab-structured
    indices: slot ``j`` of query tile ``t`` holds a row inside window
    ``off[t]*2048 + j*WIN .. +WIN`` (or a duplicate / -1-fill), so the
    one-hot MXU matmuls contract against per-tile windows fetched at
    scalar-prefetched offsets — half the matmul rows of the global-bucket
    variant (no Wp padding waste).

Semantics vs the full-scan kernels: counts and validity are exact;
selection is stratified over the slab's windows instead of over global
buckets, i.e. up to NW distinct picks per query (NW = 64 windows here)
randomized within cells — a distribution change that is quality-gated on
the frozen benchmark suite (tools/benchmark_eval.py --slab-cell).
Reference behavior being replaced: get_regiondataset.py:330-341 (radius
grouping) and gripper_region_network.py:436-550 (closing-region crop).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128      # queries per tile (tiles shared by selection and pooling)
_SCAN = 2048   # columns per scan step / rows per pooling fetch block
_BIG = 1e38    # finite sentinel for the pooling max

# selection window geometry (span must be whole _SCAN blocks)
_WIN_GROUP = 128   # window width for grouping; 4 slots per window
_SPW_GROUP = 4
_WIN_CROP = 256    # window width for the crop; 1 slot per window
_SPW_CROP = 1


class SortedCloud(NamedTuple):
    """A point cloud in slab order (ascending x-cell, random within)."""

    xyz: jax.Array       # [B, N, 3] f32
    cell_row: jax.Array  # [B, N] int32 nondecreasing cell ids
    order: jax.Array     # [B, N] int32 original row of each sorted row


def sort_cloud(key: jax.Array, pc: jax.Array, cell: float
               ) -> tuple[jax.Array, SortedCloud]:
    """Order points by (floor(x/cell), uniform random within the cell).

    pc [B, N, C>=3] (xyz first).  Returns (pc_sorted, SortedCloud) —
    all C channels ride the one multi-operand sort (no gathers), so the
    sorted cloud can be fed straight to the (permutation-equivariant)
    backbone and every downstream per-point tensor stays in slab order.
    """
    x = pc[..., 0].astype(jnp.float32)
    cid = jnp.clip(jnp.floor(x / jnp.float32(cell)), -1e6, 1e6)
    u = jax.random.uniform(key, x.shape)
    # cell ids are small integers, exactly representable in f32, so the
    # composite key orders by (cell, u) in one sort pass
    sortkey = cid + u * 0.999
    B, N = x.shape
    orig = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    operands = (sortkey,) + tuple(
        pc[..., c] for c in range(pc.shape[-1])) + (orig,)
    s = lax.sort(operands, dimension=-1, num_keys=1)
    pc_sorted = jnp.stack(s[1:1 + pc.shape[-1]], axis=-1)
    xs = pc_sorted[..., :3].astype(jnp.float32)
    # cell ids are a pure function of x — recompute from the sorted x
    # instead of paying a ninth sort operand
    cell_row = jnp.clip(jnp.floor(xs[..., 0] / jnp.float32(cell)),
                        -1e6, 1e6).astype(jnp.int32)
    return pc_sorted, SortedCloud(xs, cell_row, s[-1])


def n_scan_blocks(n: int) -> int:
    return -(-n // _SCAN)


def slab_bounds(cell_row: jax.Array, qx: jax.Array, bound: float,
                cell: float, nblk: int, span_blocks: int) -> jax.Array:
    """Per-query-tile scan range and selection-span origin.

    Args:
      cell_row: [B, N] sorted cell ids.  qx: [B, Mp] query x (Mp % 128
      == 0; padded queries hold huge x).  bound: max |px - qx| any
      passing point can have.  cell: quantization of `cell_row`.
      nblk: scan blocks (n_scan_blocks(N)).  span_blocks: selection span.

    Returns:
      [B, T, 3] int32 (start_blk, stop_blk, off_blk): scanning blocks
      [start, stop) covers every point within `bound` of the tile's
      queries; [off, off+span) is the selection span (covers the whole
      slab when it fits, else centered on it).
    """
    B, Mp = qx.shape
    T = Mp // _TM
    qt = qx.reshape(B, T, _TM)
    # pad queries hold huge x — excluding them keeps a mixed real/pad
    # tile's scan range tight instead of covering the whole cloud (their
    # outputs are sliced off by the caller); an all-pad tile degenerates
    # to a single-block scan
    real = qt < 1e9
    lo = jnp.min(jnp.where(real, qt, jnp.inf), -1) - bound
    hi = jnp.max(jnp.where(real, qt, -jnp.inf), -1) + bound
    lo = jnp.where(jnp.any(real, -1), lo, 1e9)
    hi = jnp.where(jnp.any(real, -1), hi, 1e9)
    lo_c = jnp.clip(jnp.floor(lo / cell), -1e6, 1e6).astype(jnp.int32)
    hi_c = jnp.clip(jnp.floor(hi / cell), -1e6, 1e6).astype(jnp.int32)
    srow = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left"))(cell_row, lo_c)
    erow = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right"))(cell_row, hi_c)
    start = jnp.clip(srow // _SCAN, 0, nblk - 1).astype(jnp.int32)
    stop = jnp.clip(-(-erow // _SCAN), start + 1, nblk).astype(jnp.int32)
    fits = (stop - start) <= span_blocks
    mid = ((srow + erow) // (2 * _SCAN)).astype(jnp.int32)
    off_fit = jnp.minimum(start, nblk - span_blocks)
    off_ctr = jnp.clip(mid - span_blocks // 2, 0, nblk - span_blocks)
    off = jnp.where(fits, off_fit, off_ctr).astype(jnp.int32)
    return jnp.stack([start, stop, off], axis=-1)


def _hash23(rows, cols, seed):
    """Counter-hash (ops/sampling.hash_uniform rationale) producing
    23-bit int32 tiebreak scores — int32 (not uint32->f32, which Mosaic
    can't lower; not even float: int argmax is cheaper on the VPU)."""
    h = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + cols.astype(jnp.uint32) * jnp.uint32(2654435761)
         + seed)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B)
    h = h ^ (h >> 16)
    return (h >> 9).astype(jnp.int32)


# odd multipliers: h -> (h * odd) mod 2^23 is a bijection on the 23-bit
# scores, so each selection stream is an independent-looking uniform
# reshuffle of one hash evaluation (4x cheaper than 4 full hashes)
_STREAM_ODD = (1, 0x3779B1, 0x85EBCB, 0x27D4ED)


def _emit_rows(idx_ref, row_list, k, off, in_span):
    """Write this step's selection rows [rps, _TM] into the resident
    output block at the span-relative offset (rps-aligned dynamic start).
    Rows of span steps that were never scanned keep their k==0 init (-1:
    provably no in-range point there)."""
    rps = len(row_list)
    blk = jnp.concatenate([r[None, :] for r in row_list], axis=0)

    @pl.when(in_span)
    def _():
        idx_ref[pl.ds((k - off) * rps, rps), :] = blk


def _scan_step(span_blocks: int, mode: str, T: int, ss_ref, meta_ref):
    """Shared grid-step decode for the selection kernels.

    Full grid (mode="full", (B, T, nblk)): grid dim 2 walks every scan
    block; steps outside [start, stop) skip compute but still pay grid
    latency.  Flat grid (mode="flat", (G,)): ONE grid step per live
    (tile, scan-block) pair — `meta_ref` [G, 5] (bt, blk, first, last,
    live), built by `_flat_steps` from the same [start, stop) spans, so
    the two modes scan identical blocks in identical order and are
    bit-identical.  Dead padding steps (live=0) refetch the previous
    block and skip everything."""
    if mode == "flat":
        g = pl.program_id(0)
        bt = meta_ref[g, 0]
        b = bt // T
        mt = bt - b * T
        kb = meta_ref[g, 1]
        first = meta_ref[g, 2] == 1
        last = meta_ref[g, 3] == 1
        in_scan = meta_ref[g, 4] == 1
    else:
        b, mt, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        kb = k
        in_scan = (kb >= ss_ref[b, mt, 0]) & (kb < ss_ref[b, mt, 1])
        first = k == 0
        last = k == pl.num_programs(2) - 1
    off = ss_ref[b, mt, 2]
    in_span = (kb >= off) & (kb < off + span_blocks)
    return b, mt, kb, in_scan, in_span, off, first, last


def _flat_steps(ss: jax.Array, G: int) -> tuple[jax.Array, jax.Array]:
    """Flatten per-tile scan spans into a [G, 5] step table.

    Row g = (bt, blk, first, last, live): grid step g scans block `blk`
    for flat tile `bt` (= b*T + mt).  Live steps enumerate every tile's
    [start, stop) span in order; padding steps (g >= total) repeat the
    final block (same BlockSpec index -> no refetch) with live=0.
    Returns (meta, total); the caller dispatches the full grid instead
    when total > G."""
    B, T, _ = ss.shape
    start = ss[..., 0].reshape(-1).astype(jnp.int32)       # [B*T]
    stop = ss[..., 1].reshape(-1).astype(jnp.int32)
    span = stop - start
    csum = jnp.cumsum(span)
    total = csum[-1]
    tstart = csum - span
    g = jnp.arange(G, dtype=jnp.int32)
    bt = jnp.searchsorted(csum, g, side="right").astype(jnp.int32)
    live = g < total
    bt = jnp.minimum(bt, B * T - 1)
    k = g - tstart[bt]
    blk = jnp.minimum(start[bt] + k, stop[bt] - 1)
    first = live & (k == 0)
    last = live & (k == span[bt] - 1)
    meta = jnp.stack([bt, blk, first.astype(jnp.int32),
                      last.astype(jnp.int32), live.astype(jnp.int32)],
                     axis=-1)
    return meta, total


def _group_slab_kernel(r2: float, n_valid: int, span_blocks: int, K: int,
                       win: int, spw: int, distinct: bool, mode: str,
                       T: int, *refs):
    if mode == "flat":
        meta_ref, refs = refs[0], refs[1:]
    else:
        meta_ref = None
    (ss_ref, seed_ref, x_ref, c_ref,
     idx_ref, cnt_ref, sel_ref, cnt_acc, first_acc) = refs
    b, mt, kb, in_scan, in_span, off, first, last = _scan_step(
        span_blocks, mode, T, ss_ref, meta_ref)

    @pl.when(first)
    def _():
        idx_ref[...] = jnp.full(idx_ref.shape, -1, jnp.int32)
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    @pl.when(in_scan)
    def _():
        # transposed layout: scanned points on SUBLANES, queries on
        # LANES — every reduction (count, any, argmax) runs over the
        # sublane axis as an elementwise tree instead of a cross-lane
        # shuffle cascade (~8x cheaper; measured 2x+ end-to-end)
        seed = seed_ref[0]
        col0 = kb * _SCAN
        mrow = mt * _TM
        rows = lax.broadcasted_iota(jnp.int32, (win, _TM), 1) + mrow
        iota_w = lax.broadcasted_iota(jnp.int32, (win, _TM), 0)
        imax = jnp.int32(2**31 - 1)
        row_list = []
        for w in range(_SCAN // win):
            d2 = None
            for c in range(3):
                xg = x_ref[w * win:(w + 1) * win, c:c + 1]   # [WIN, 1]
                diff = xg - c_ref[c, :][None, :]             # [WIN, TM]
                d2 = diff * diff if d2 is None else d2 + diff * diff
            cols = iota_w + (col0 + w * win)
            mask = (d2 <= r2) & (cols < n_valid)
            cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(mask, axis=0,
                                                    dtype=jnp.int32)
            ok = jnp.any(mask, axis=0)          # shared by all streams
            h = _hash23(rows, cols, seed)
            # 23-bit scores are f32-exact (int compare would work too,
            # but f32 keeps the max/min-where pattern uniform)
            val = jnp.where(mask, h.astype(jnp.float32), -1.0)
            for s in range(spw):
                if distinct and s > 0:
                    # sample WITHOUT replacement within the window: mask
                    # out the previous stream's winner (uniform top-spw
                    # by one hash) — maximizes distinct neighbours for
                    # the SA layers' max-pool
                    val = jnp.where(iota_w == win_col[None, :],
                                    -1.0, val)
                elif not distinct and s > 0:
                    hs = (h * _STREAM_ODD[s]) & 0x7FFFFF
                    val = jnp.where(mask, hs.astype(jnp.float32), -1.0)
                # first-index argmax as max + min-where (tie semantics
                # identical to jnp.argmax: lowest winning column)
                vmax = jnp.max(val, axis=0)
                win_col = jnp.min(jnp.where(val == vmax[None, :],
                                            iota_w, imax),
                                  axis=0).astype(jnp.int32)
                wrow = col0 + w * win + win_col
                hit = ok if not distinct else jnp.any(val >= 0.0, axis=0)
                row_list.append(jnp.where(hit, wrow, -1))
                first_acc[0, :] = jnp.where(
                    (first_acc[0, :] < 0) & hit & in_span, wrow,
                    first_acc[0, :])
        _emit_rows(idx_ref, row_list, kb, off, in_span)

    @pl.when(last)
    def _():
        cnt_ref[0, :] = cnt_acc[0, :]
        sel_ref[0, :] = first_acc[0, :]


def _crop_slab_kernel(box: tuple, n_valid: int, span_blocks: int, K: int,
                      mode: str, T: int, *refs):
    """f_ref [9, TM] row-major 3x3 frames (columns = gripper axes);
    c_ref [3, TM] grasp bases — same contract as ops/crop_pallas.py."""
    xlo, xhi, yabs, zabs = box
    if mode == "flat":
        meta_ref, refs = refs[0], refs[1:]
    else:
        meta_ref = None
    (ss_ref, seed_ref, x_ref, f_ref, c_ref,
     idx_ref, cnt_ref, sel_ref, cnt_acc, first_acc) = refs
    b, mt, kb, in_scan, in_span, off, first, last = _scan_step(
        span_blocks, mode, T, ss_ref, meta_ref)

    @pl.when(first)
    def _():
        idx_ref[...] = jnp.full(idx_ref.shape, -1, jnp.int32)
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    @pl.when(in_scan)
    def _():
        # transposed layout: points on sublanes, queries on lanes
        # (see _group_slab_kernel)
        seed = seed_ref[0]
        col0 = kb * _SCAN
        mrow = mt * _TM
        rows = lax.broadcasted_iota(jnp.int32, (_WIN_CROP, _TM), 1) + mrow
        iota_w = lax.broadcasted_iota(jnp.int32, (_WIN_CROP, _TM), 0)
        imax = jnp.int32(2**31 - 1)
        row_list = []
        for w in range(_SCAN // _WIN_CROP):
            rel = [x_ref[w * _WIN_CROP:(w + 1) * _WIN_CROP, c:c + 1]
                   - c_ref[c, :][None, :] for c in range(3)]  # 3x[WIN,TM]
            loc = [f_ref[0 + j, :][None, :] * rel[0]
                   + f_ref[3 + j, :][None, :] * rel[1]
                   + f_ref[6 + j, :][None, :] * rel[2] for j in range(3)]
            cols = iota_w + (col0 + w * _WIN_CROP)
            mask = ((loc[0] > xlo) & (loc[0] < xhi)
                    & (jnp.abs(loc[1]) < yabs) & (jnp.abs(loc[2]) < zabs)
                    & (cols < n_valid))
            cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(mask, axis=0,
                                                    dtype=jnp.int32)
            # 23-bit scores are f32-exact
            val = jnp.where(mask,
                            _hash23(rows, cols, seed).astype(jnp.float32),
                            -1.0)
            vmax = jnp.max(val, axis=0)
            win_col = jnp.min(jnp.where(val == vmax[None, :], iota_w,
                                        imax), axis=0).astype(jnp.int32)
            ok = jnp.any(mask, axis=0)
            win = col0 + w * _WIN_CROP + win_col
            row_list.append(jnp.where(ok, win, -1))
            first_acc[0, :] = jnp.where(
                (first_acc[0, :] < 0) & ok & in_span, win, first_acc[0, :])
        _emit_rows(idx_ref, row_list, kb, off, in_span)

    @pl.when(last)
    def _():
        cnt_ref[0, :] = cnt_acc[0, :]
        sel_ref[0, :] = first_acc[0, :]


def _slab_select_call(kernel, B, Mp, K, nblk, interpret,
                      ss, seed, *tensors):
    """Full-grid pallas_call plumbing for the two selection kernels.

    tensors[0] is the [B, nblk*_SCAN, 3] sorted cloud — points on the
    SUBLANE axis (scanned at the prefetched slab block index); the rest
    are [B, rows, Mp] per-query tensors tiled along the query dim.
    Grid (B, T, nblk): every scan block is a grid step; steps outside a
    tile's span skip compute AND the x fetch (the index map clips into
    the span, re-presenting a resident block)."""
    T = Mp // _TM
    grid = (B, T, nblk)

    def x_map(b, mt, k, ss_ref):
        lo = ss_ref[b, mt, 0]
        hi = ss_ref[b, mt, 1] - 1
        return (b, jnp.clip(k, lo, hi), 0)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((None, _SCAN, 3), x_map,
                             memory_space=pltpu.VMEM)]
    for t in tensors[1:]:
        in_specs.append(pl.BlockSpec(
            (None, t.shape[1], _TM), lambda b, mt, k, ss_ref: (b, 0, mt),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, K, _TM),
                         lambda b, mt, k, ss_ref: (b, 0, mt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM),
                         lambda b, mt, k, ss_ref: (b, 0, mt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM),
                         lambda b, mt, k, ss_ref: (b, 0, mt),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, _TM), jnp.int32),
                        pltpu.VMEM((1, _TM), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ],
        interpret=interpret,
    )(ss, seed, *tensors)


def _slab_flat_call(kernel, B, Mp, K, G, interpret,
                    meta, ss, seed, *tensors):
    """Flat-grid (sum-of-spans) pallas_call for the selection kernels.

    Grid (G,): step g scans block meta[g, 1] for flat tile meta[g, 0]
    (= b*T + mt).  Live steps cover exactly each tile's [start, stop)
    span — dead scan blocks cost ZERO grid steps instead of a clipped
    revisit; padding steps (g >= total) re-present the final block and
    skip compute.  Output blocks are visited contiguously per tile
    (one fetch/writeback each)."""
    T = Mp // _TM

    def x_map(g, meta_ref, ss_ref):
        bt = meta_ref[g, 0]
        return (bt // T, meta_ref[g, 1], 0)

    def q_map(g, meta_ref, ss_ref):
        bt = meta_ref[g, 0]
        return (bt // T, 0, bt - (bt // T) * T)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((None, _SCAN, 3), x_map,
                             memory_space=pltpu.VMEM)]
    for t in tensors[1:]:
        in_specs.append(pl.BlockSpec((None, t.shape[1], _TM), q_map,
                                     memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, K, _TM), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM), q_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, _TM), jnp.int32),
                        pltpu.VMEM((1, _TM), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ],
        interpret=interpret,
    )(meta, ss, seed, *tensors)


def span_blocks_for(k: int, win: int, spw: int) -> int:
    """Selection-span blocks for K output slots at (win, spw) geometry."""
    rps = spw * _SCAN // win
    assert k % rps == 0, (k, win, spw)
    return k // rps


def group_span_blocks(group_num: int) -> int:
    return span_blocks_for(group_num, _WIN_GROUP, _SPW_GROUP)


def crop_span_blocks(gripper_num: int) -> int:
    assert gripper_num % (_SPW_CROP * _SCAN // _WIN_CROP) == 0, gripper_num
    return gripper_num * _WIN_CROP // (_SPW_CROP * _SCAN)


def _pad_rows(a: jax.Array, np_: int, value: float) -> jax.Array:
    """Pad axis 1 (the point/row axis) of [B, N, C] to np_ rows."""
    pad = np_ - a.shape[1]
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)), constant_values=value)
    return a


def _pad_cols(a: jax.Array, np_: int, value: float) -> jax.Array:
    pad = np_ - a.shape[-1]
    if pad:
        a = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, pad),),
                    constant_values=value)
    return a


def _dispatch_select(make_kernel, B, Mp, K, nblk, grid_span, interpret,
                     ss, seed, *tensors):
    """Run the flat sum-of-spans grid (G = B*T*grid_span steps TOTAL,
    one per live (tile, block) pair) when the tiles' spans sum to <= G
    — tiles touch 2-4 of ~13 blocks, and the flat grid pays for exactly
    those instead of ~1us per skipped step — else fall back to the full
    grid.  Both branches scan the same blocks in the same order, so
    outputs are bit-identical.

    MEASURED (tools/ab_flat_grid.py, TPU v5e, 2026-08-18): the flat grid
    is bit-identical but NOT faster — 0.498 vs 0.487 ms/call in-jit at
    the serving shapes — because skipped full-grid steps (no DMA, no
    compute) cost ~nothing in the transposed kernels, while the flat
    path adds the meta-table XLA ops.  grid_span=None (default) therefore
    runs the full grid, which also compiles ONE kernel variant instead
    of two (the lax.cond traces and Mosaic-compiles both — a one-time
    remote-compile cost the persistent cache amortizes).  The flat grid
    stays available for much larger clouds (nblk >> 13), where dead
    steps multiply."""
    T = Mp // _TM
    if grid_span is None or grid_span >= nblk:
        return _slab_select_call(make_kernel("full"), B, Mp, K, nblk,
                                 interpret, ss, seed, *tensors)
    G = B * T * grid_span
    meta, total = _flat_steps(ss, G)
    return lax.cond(
        total <= G,
        lambda: _slab_flat_call(make_kernel("flat"), B, Mp, K, G,
                                interpret, meta, ss, seed, *tensors),
        lambda: _slab_select_call(make_kernel("full"), B, Mp, K, nblk,
                                  interpret, ss, seed, *tensors))


@functools.partial(jax.jit, static_argnames=("radius", "group_num",
                                             "cell", "win", "spw",
                                             "distinct", "grid_span",
                                             "interpret"))
def group_slab(sc: SortedCloud, centers: jax.Array, seed: jax.Array,
               radius: float, group_num: int, cell: float,
               win: int = _WIN_GROUP, spw: int = _SPW_GROUP,
               distinct: bool = False, grid_span: int | None = None,
               interpret: bool = False):
    """Slab radius grouping over a sorted cloud.

    Args:
      sc: sort_cloud output.  centers: [B, M, 3] query centers (sort by x
        for locality; correctness holds regardless).  seed: [] uint32.
      radius, group_num, cell: static.
      win, spw, distinct: selection geometry — `spw` picks per `win`-wide
        window; `distinct=True` samples without replacement within each
        window (used by the SA-layer ball query, where max-pool diversity
        matters and the span must cover the whole ball).
      grid_span: None (default) = full grid — the MEASURED best at the
        inference preset (see _dispatch_select).  An int enables the
        flat sum-of-spans grid with that many AVERAGE scan blocks per
        tile (measured spans average 2.4-3.9); overflow falls back to
        the full grid under lax.cond.

    Returns:
      index [B, M, K] int32 rows into sc.xyz (empty slots filled with the
        query's first selected winner; 0 when nothing was selectable),
      count [B, M] exact in-radius population,
      sel_any [B, M] bool — at least one winner was selected (False =>
        treat the row as invalid even if count > 0),
      off_blk [B, T] int32 — selection-span origin for gather_max_slab.
    """
    B, N, _ = sc.xyz.shape
    M = centers.shape[1]
    K = group_num
    span_b = span_blocks_for(K, win, spw)
    nblk = n_scan_blocks(N)
    assert span_b <= nblk, (span_b, nblk)

    x = _pad_rows(sc.xyz, nblk * _SCAN, 1e10)
    mpad = (-M) % _TM
    c = jnp.swapaxes(centers[..., :3].astype(jnp.float32), 1, 2)
    c = _pad_cols(c, M + mpad, 1e10)
    Mp = M + mpad

    ss = slab_bounds(sc.cell_row, c[:, 0, :], radius, cell, nblk, span_b)
    seed = jnp.asarray(seed, jnp.uint32).reshape(1)

    def make_kernel(mode):
        return functools.partial(_group_slab_kernel, float(radius) ** 2,
                                 N, span_b, K, win, spw, distinct, mode,
                                 Mp // _TM)
    idx, cnt, first = _dispatch_select(make_kernel, B, Mp, K, nblk,
                                       grid_span, interpret, ss, seed,
                                       x, c)
    idx = jnp.swapaxes(idx, 1, 2)[:, :M]
    cnt = cnt[:, 0, :M]
    first = first[:, 0, :M]
    sel_any = first >= 0
    fill = jnp.maximum(first, 0)
    idx = jnp.where(idx >= 0, idx, fill[..., None])
    return idx, cnt, sel_any, ss[..., 2]


@functools.partial(jax.jit, static_argnames=("box", "gripper_num",
                                             "cell", "grid_span",
                                             "interpret"))
def crop_slab(sc: SortedCloud, frame: jax.Array, center: jax.Array,
              seed: jax.Array, box: tuple, gripper_num: int, cell: float,
              grid_span: int | None = None, interpret: bool = False):
    """Slab closing-region crop over a sorted cloud.

    frame [B, M, 3, 3] (columns = gripper axes), center [B, M, 3]; box =
    (xlo, xhi, yabs, zabs) as ops/crop_pallas.py.  Returns (index, count,
    sel_any, off_blk) — see group_slab.
    """
    B, N, _ = sc.xyz.shape
    M = center.shape[1]
    K = gripper_num
    span_b = crop_span_blocks(K)
    nblk = n_scan_blocks(N)
    assert span_b <= nblk, (span_b, nblk)

    x = _pad_rows(sc.xyz, nblk * _SCAN, 1e10)
    mpad = (-M) % _TM
    f = jnp.swapaxes(frame.reshape(B, M, 9), 1, 2)          # [B, 9, M]
    f = _pad_cols(f.astype(jnp.float32), M + mpad, 0.0)
    c = jnp.swapaxes(center.astype(jnp.float32), 1, 2)
    c = _pad_cols(c, M + mpad, 1e10)
    Mp = M + mpad

    # any inside point satisfies |px - cx| <= half-diagonal of the box
    xlo, xhi, yabs, zabs = box
    bound = math.sqrt(max(abs(xlo), abs(xhi)) ** 2
                      + yabs ** 2 + zabs ** 2) + 1e-4
    ss = slab_bounds(sc.cell_row, c[:, 0, :], bound, cell, nblk, span_b)
    seed = jnp.asarray(seed, jnp.uint32).reshape(1)

    def make_kernel(mode):
        return functools.partial(_crop_slab_kernel,
                                 tuple(float(v) for v in box), N, span_b,
                                 K, mode, Mp // _TM)
    idx, cnt, first = _dispatch_select(make_kernel, B, Mp, K, nblk,
                                       grid_span, interpret, ss, seed,
                                       x, f, c)
    idx = jnp.swapaxes(idx, 1, 2)[:, :M]
    cnt = cnt[:, 0, :M]
    first = first[:, 0, :M]
    sel_any = first >= 0
    fill = jnp.maximum(first, 0)
    idx = jnp.where(idx >= 0, idx, fill[..., None])
    return idx, cnt, sel_any, ss[..., 2]


def ball_query_slab(sc: SortedCloud, centers: jax.Array, seed: jax.Array,
                    radius: float, num_neighbours: int, cell: float,
                    interpret: bool = False
                    ) -> tuple[jax.Array, jax.Array]:
    """SA-layer ball query over a sorted cloud (ops/ball_query contract).

    Selection geometry (win=256, spw=2, distinct): two without-replacement
    picks per 256-wide window over a 4-block span — the span must cover
    the ball's full candidate-row slab (~2-3 cells of rows either side of
    the query tile), or edge windows become unselectable and the distinct-
    neighbour count collapses; 4 blocks = 8192 rows covers it with ~60%
    margin at the SA1 density.  `centers` must be x-sorted for tile
    locality (any order is correct).

    Returns (index [B, M, K] rows into sc.xyz, count [B, M] capped at K)
    — short rows padded with the row's first hit (0 if none), the CUDA
    contract (ball_query_kernel.cu:62-69).
    """
    idx, cnt, _sel, _off = group_slab(
        sc, centers, seed, radius, num_neighbours, cell,
        win=256, spw=2, distinct=True, interpret=interpret)
    return idx, jnp.minimum(cnt, num_neighbours)


# ---------------------------------------------------------------------------
# Slab 3-NN (FP-layer interpolation search)
# ---------------------------------------------------------------------------

# grid-step overhead dominates this kernel (~1 us/step; the slab skips
# most steps' compute but not the step): wide key blocks + 256-row query
# tiles cut the step count 4x vs the selection kernels' (2048, 128)
# geometry — measured on chip (tools notes in docs/ROADMAP.md)
_SCAN_K = 1024  # key-block width (keys are the sparse level, e.g. 5120)
_TM_K = 256     # queries per tile (3-NN kernel only)


def _three_nn_slab_kernel(n_valid: int, mode: str, T: int, *refs):
    """Running 3 smallest squared distances per query over slab key
    blocks.  d_acc/i_acc [3, TM] scratch persists across the sequential
    grid.  Bounded grid (mode="bounded", (B, T, cap)): step k means key
    block start+k — the wrapper clamps every tile's [start, stop) span
    to the grid size (centered), and the exactness certificate +
    full-scan fallback absorb any key the clamp excluded.  Flat grid
    (mode="flat", (G,)): one step per live (tile, block) pair from
    `_flat_steps` over UNclamped spans — fewer steps AND no clamp, so
    the certificate fails less often."""
    if mode == "flat":
        meta_ref, refs = refs[0], refs[1:]
        ss_ref, xk_ref, q_ref, idx_ref, d_ref, d_acc, i_acc = refs
        g = pl.program_id(0)
        kb = meta_ref[g, 1]
        first = meta_ref[g, 2] == 1
        last = meta_ref[g, 3] == 1
        live = meta_ref[g, 4] == 1
    else:
        ss_ref, xk_ref, q_ref, idx_ref, d_ref, d_acc, i_acc = refs
        b, mt, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        kb = ss_ref[b, mt, 0] + k
        first = k == 0
        last = k == pl.num_programs(2) - 1
        live = kb < ss_ref[b, mt, 1]

    @pl.when(first)
    def _():
        d_acc[...] = jnp.full(d_acc.shape, _BIG, jnp.float32)
        i_acc[...] = jnp.zeros(i_acc.shape, jnp.int32)

    @pl.when(live)
    def _():
        # transposed layout: keys on sublanes, queries on lanes — the
        # six reductions per block run over the sublane axis as
        # elementwise trees, not cross-lane shuffles
        col0 = kb * _SCAN_K
        d2 = None
        for c in range(3):
            diff = xk_ref[:, c:c + 1] - q_ref[c, :][None, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        cols = lax.broadcasted_iota(jnp.int32, d2.shape, 0) + col0
        d2 = jnp.where(cols < n_valid, d2, _BIG)
        for _ in range(3):
            # first-index argmin via min + min-where (tie-robust on
            # Mosaic, CLAUDE.md)
            bd = jnp.min(d2, axis=0)                         # [TM]
            bi = jnp.min(jnp.where(d2 == bd[None, :], cols,
                                   jnp.int32(2**31 - 1)), axis=0)
            d2 = jnp.where(cols == bi[None, :], _BIG, d2)
            # sorted insert into the (d_acc, i_acc) triple: shift larger
            # entries up one slot, discard the final carry (max of 4)
            dn, in_ = bd, bi
            for slot in (0, 1, 2):
                ds = d_acc[slot, :]
                is_ = i_acc[slot, :]
                take = dn < ds
                d_acc[slot, :] = jnp.where(take, dn, ds)
                i_acc[slot, :] = jnp.where(take, in_, is_)
                dn = jnp.where(take, ds, dn)
                in_ = jnp.where(take, is_, in_)

    @pl.when(last)
    def _():
        idx_ref[...] = i_acc[...]
        d_ref[...] = d_acc[...]


@functools.partial(jax.jit, static_argnames=("bound", "grid_span",
                                             "flat", "interpret"))
def three_nn_slab(query: jax.Array, key: jax.Array, bound: float = 0.06,
                  grid_span: int = 3, flat: bool = False,
                  interpret: bool = False
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """3 nearest keys per query, scanning only keys with |kx - qx| within
    each query tile's x-range + `bound`.

    query [B, Nq, 3] (x-sorted for tile locality — correctness holds for
    any order, speed doesn't), key [B, NK, 3] MUST be x-ascending.

    Returns (index [B, Nq, 3] into key rows, d2 [B, Nq, 3] ascending,
    proven [B] bool).  `proven` is the per-batch exactness certificate:
    every query's found 3rd-NN is closer than the nearest unscanned key
    could possibly be (out-of-slab => |kx - qx| alone exceeds the found
    distance).  When False (query in a key-sparse region), fall back to
    the full scan — the caller does this under lax.cond, so the fast
    path stays exact with probability ~1 and EXACT always.
    """
    B, Nq, _ = query.shape
    NK = key.shape[1]
    nkb = n_scan_blocks_k(NK)
    q = jnp.swapaxes(query.astype(jnp.float32), 1, 2)        # [B, 3, Nq]
    mpad = (-Nq) % _TM_K
    q = _pad_cols(q, Nq + mpad, 1e10)
    Mp = Nq + mpad
    T = Mp // _TM_K
    xk = _pad_rows(key.astype(jnp.float32), nkb * _SCAN_K,
                   1e10)                                     # [B, NKp, 3]

    kx = key[..., 0].astype(jnp.float32)                     # [B, NK]
    qt = q[:, 0, :].reshape(B, T, _TM_K)
    realq = qt < 1e9          # pad queries would inflate the tile range
    lo = jnp.min(jnp.where(realq, qt, jnp.inf), -1) - bound
    hi = jnp.max(jnp.where(realq, qt, -jnp.inf), -1) + bound
    anyq = jnp.any(realq, -1)
    lo = jnp.where(anyq, lo, 1e9)
    hi = jnp.where(anyq, hi, 1e9)
    srow = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left")
                    )(kx, lo)
    erow = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right")
                    )(kx, hi)
    start_u = jnp.clip(srow // _SCAN_K, 0, nkb - 1).astype(jnp.int32)
    stop_u = jnp.clip(-(-erow // _SCAN_K), start_u + 1,
                      nkb).astype(jnp.int32)

    out_shape = [jax.ShapeDtypeStruct((B, 3, Mp), jnp.int32),
                 jax.ShapeDtypeStruct((B, 3, Mp), jnp.float32)]
    scratch = [pltpu.VMEM((3, _TM_K), jnp.float32),
               pltpu.VMEM((3, _TM_K), jnp.int32)]
    q_spec3 = pl.BlockSpec((None, 3, _TM_K),
                           lambda b, mt, k, ss_ref: (b, 0, mt),
                           memory_space=pltpu.VMEM)

    def call_bounded(cap):
        # clamp each tile's span to `cap` blocks, centered on the slab —
        # any excluded key shows up in the certificate below and
        # triggers the caller's exact full-scan fallback
        if cap < nkb:
            mid = ((srow + erow) // (2 * _SCAN_K)).astype(jnp.int32)
            s_ctr = jnp.clip(mid - cap // 2, 0, nkb - cap)
            start = jnp.where(stop_u - start_u > cap, s_ctr, start_u)
            stop = jnp.minimum(stop_u, start + cap)
        else:
            start, stop = start_u, stop_u
        ss = jnp.stack([start, stop], axis=-1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, T, cap),
            in_specs=[
                pl.BlockSpec((None, _SCAN_K, 3),
                             lambda b, mt, k, ss_ref: (
                                 b, jnp.minimum(ss_ref[b, mt, 0] + k,
                                                ss_ref[b, mt, 1] - 1), 0),
                             memory_space=pltpu.VMEM),
                q_spec3,
            ],
            out_specs=[q_spec3, q_spec3],
            scratch_shapes=scratch,
        )
        idx, d2 = pl.pallas_call(
            functools.partial(_three_nn_slab_kernel, NK, "bounded", T),
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(ss, xk, q)
        return idx, d2, start, stop

    def call_flat(G):
        # flat sum-of-spans grid over the UNclamped spans: fewer steps
        # than (B, T, cap) and no recentring, so the certificate only
        # fails on genuinely key-sparse queries
        ss = jnp.stack([start_u, stop_u], axis=-1)
        meta, _total = _flat_steps(ss, G)

        def x_map(g, meta_ref, ss_ref):
            bt = meta_ref[g, 0]
            return (bt // T, meta_ref[g, 1], 0)

        def q_map(g, meta_ref, ss_ref):
            bt = meta_ref[g, 0]
            return (bt // T, 0, bt - (bt // T) * T)

        q_spec = pl.BlockSpec((None, 3, _TM_K), q_map,
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[pl.BlockSpec((None, _SCAN_K, 3), x_map,
                                   memory_space=pltpu.VMEM),
                      q_spec],
            out_specs=[q_spec, q_spec],
            scratch_shapes=scratch,
        )
        idx, d2 = pl.pallas_call(
            functools.partial(_three_nn_slab_kernel, NK, "flat", T),
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(meta, ss, xk, q)
        return idx, d2, start_u, stop_u

    cap = min(grid_span, nkb)
    if cap >= nkb or not flat:
        idx, d2, start, stop = call_bounded(cap)
    else:
        # G hugs the measured span sum (mean ~2.1 blocks/tile at the
        # inference preset) — padding steps cost grid latency like the
        # bounded grid's skipped steps, so oversizing G wastes the win
        G = (B * T * 5) // 2
        _meta, total = _flat_steps(jnp.stack([start_u, stop_u], -1), G)
        idx, d2, start, stop = lax.cond(
            total <= G, lambda: call_flat(G), lambda: call_bounded(cap))
    idx = jnp.swapaxes(idx, 1, 2)[:, :Nq]
    d2 = jnp.swapaxes(d2, 1, 2)[:, :Nq]

    # exactness certificate: nearest unscanned key per tile, by x alone
    left_row = start * _SCAN_K - 1
    right_row = stop * _SCAN_K
    left_x = jnp.where(
        left_row >= 0,
        jnp.take_along_axis(kx, jnp.maximum(left_row, 0), axis=1),
        -jnp.float32(_BIG))                                   # [B, T]
    right_x = jnp.where(
        right_row < NK,
        jnp.take_along_axis(kx, jnp.minimum(right_row, NK - 1), axis=1),
        jnp.float32(_BIG))
    qx = qt                                                   # [B, T, TM]
    margin = jnp.minimum(qx - left_x[..., None],
                         right_x[..., None] - qx)
    # a query can sit OUTSIDE its tile's scanned window when the span
    # clamp recentred it (cap < span) — margin goes negative there;
    # clamp to 0 so such queries are explicitly unproven instead of
    # relying on margin*margin looking like a positive budget
    margin = jnp.maximum(margin, 0.0)
    margin = margin.reshape(B, Mp)[:, :Nq]
    proven = jnp.all(d2[..., 2] <= margin * margin, axis=-1)  # [B]
    return idx, d2, proven


def n_scan_blocks_k(n: int) -> int:
    return -(-n // _SCAN_K)


# ---------------------------------------------------------------------------
# Fused gather + max over slab-structured indices
# ---------------------------------------------------------------------------


def _gmax_slab_kernel(win: int, spw: int, with_argmax: bool,
                      off_ref, idx_ref, fs_ref, out_ref, *rest):
    """Grid (B, S/TM, span_blocks); out block resident over the span.

    idx_ref [rps, TM] — this step's slots; fs_ref [_SCAN, C] — feature
    rows at block off[b,st]+kc; slot j of window w holds a row in
    [base + w*win, +win) or a duplicate/fill (handled by the one-hot
    validity mask: uncovered slots contribute -BIG, and every fill value
    is also some slot's own in-window pick, so the max is unchanged).
    """
    b, st, kc = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    win_ref = rest[0] if with_argmax else None
    dtype = out_ref.dtype
    TS = out_ref.shape[0]

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, -_BIG, dtype)
        if with_argmax:
            win_ref[...] = jnp.zeros(win_ref.shape, jnp.int32)

    base = (off_ref[b, st] + kc) * _SCAN
    fw = fs_ref[...]
    if fw.dtype == jnp.float32:
        # exact 3-way bf16 split (ops/pooling.py rationale)
        h1 = fw.astype(jnp.bfloat16)
        r1 = fw - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
        terms = (h1, h2, h3)
    else:
        terms = (fw,)

    contract0 = (((0,), (0,)), ((), ()))
    iota_w = lax.broadcasted_iota(jnp.int32, (win, TS), 0)
    for w in range(_SCAN // win):
        wbase = base + w * win
        tslices = [t[w * win:(w + 1) * win] for t in terms]
        for s in range(spw):
            j = w * spw + s                       # static row in idx blk
            row = idx_ref[j:j + 1, :]                       # [1, TS]
            rel = row - wbase
            onehot = ((iota_w == rel) & (rel >= 0)
                      & (rel < win)).astype(jnp.bfloat16)   # [win, TS]
            picked = jnp.zeros((TS, fw.shape[-1]), jnp.float32)
            for t in tslices:
                picked = picked + lax.dot_general(
                    onehot, t, dimension_numbers=contract0,
                    preferred_element_type=jnp.float32)
            # uncovered slots (duplicates/fills from other windows) have
            # an all-zero one-hot; push them to -BIG via a 1-column cover
            # matmul so they can never win
            ones = jnp.ones((win, 1), jnp.bfloat16)
            cover = lax.dot_general(onehot, ones,
                                    dimension_numbers=contract0,
                                    preferred_element_type=jnp.float32)
            picked = jnp.where(cover > 0.5, picked,
                               jnp.asarray(-_BIG, jnp.float32))
            if with_argmax:
                w_iota = lax.broadcasted_iota(jnp.int32, (win, 1), 0)
                w_hi = (w_iota // 256).astype(jnp.bfloat16)
                w_lo = (w_iota % 256).astype(jnp.bfloat16)
                hi = lax.dot_general(onehot, w_hi,
                                     dimension_numbers=contract0,
                                     preferred_element_type=jnp.float32)
                lo = lax.dot_general(onehot, w_lo,
                                     dimension_numbers=contract0,
                                     preferred_element_type=jnp.float32)
                rowid = (hi.astype(jnp.int32) * 256
                         + lo.astype(jnp.int32) + wbase)     # [TS, 1]
                # compare in f32: Mosaic can't lower bf16 cmpf on v5e, and
                # picked is exact in f32 (one-hot MXU pick of bf16 rows), so
                # the downcast on store is lossless.
                prev = out_ref[...].astype(jnp.float32)
                upd = picked > prev
                out_ref[...] = jnp.where(upd, picked, prev).astype(dtype)
                win_ref[...] = jnp.where(upd, rowid, win_ref[...])
            else:
                acc = jnp.maximum(out_ref[...].astype(jnp.float32), picked)
                out_ref[...] = acc.astype(dtype)


@functools.partial(jax.jit, static_argnames=("win", "spw", "with_argmax",
                                             "interpret"))
def gather_max_slab(fs: jax.Array, index: jax.Array, off_blk: jax.Array,
                    win: int, spw: int, with_argmax: bool = False,
                    interpret: bool = False):
    """max_k fs[b, index[b,s,k], c] for slab-structured indices.

    fs [B, N, C] sorted features; index [B, S, K] from group_slab
    (win=128, spw=4) or crop_slab (win=256, spw=1); off_blk [B, S/128]
    the spans those selectors returned.  Rows with no covered slot
    (sel_any False upstream) pool to -BIG — mask or replace downstream.
    """
    B, N, C = fs.shape
    _, S, K = index.shape
    rps = (_SCAN // win) * spw            # slots per scan block
    assert K % rps == 0, (K, rps)
    span_b = K // rps
    nblk = n_scan_blocks(N)
    pad_n = nblk * _SCAN - N
    if pad_n:
        fs = jnp.pad(fs, ((0, 0), (0, pad_n), (0, 0)),
                     constant_values=-_BIG)
    pad_s = (-S) % _TM
    idx = index.astype(jnp.int32)
    if pad_s:
        idx = jnp.pad(idx, ((0, 0), (0, pad_s), (0, 0)))
    Sp = S + pad_s
    idx_t = jnp.swapaxes(idx, 1, 2)                    # [B, K, Sp]

    out_shape = [jax.ShapeDtypeStruct((B, Sp, C), fs.dtype)]
    out_specs = [pl.BlockSpec((None, _TM, C),
                              lambda b, st, kc, off: (b, st, 0),
                              memory_space=pltpu.VMEM)]
    if with_argmax:
        out_shape.append(jax.ShapeDtypeStruct((B, Sp, C), jnp.int32))
        out_specs.append(pl.BlockSpec((None, _TM, C),
                                      lambda b, st, kc, off: (b, st, 0),
                                      memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Sp // _TM, span_b),
        in_specs=[
            pl.BlockSpec((None, rps, _TM),
                         lambda b, st, kc, off: (b, kc, st),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _SCAN, C),
                         lambda b, st, kc, off: (b, off[b, st] + kc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_gmax_slab_kernel, win, spw, with_argmax),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(off_blk.astype(jnp.int32), idx_t, fs)
    pooled = res[0][:, :S]
    if with_argmax:
        return pooled, res[1][:, :S]
    return pooled


def _gm_slab_fwd(fs, index, off_blk, win, spw, interpret):
    pooled, winner = gather_max_slab(fs, index, off_blk, win, spw,
                                     with_argmax=True, interpret=interpret)
    return pooled, (winner, fs.shape[1])


def _gm_slab_bwd(win, spw, interpret, res, g):
    winner, n = res
    C = winner.shape[-1]
    keys = (winner * C
            + lax.broadcasted_iota(jnp.int32, winner.shape, 2))
    df = jax.vmap(
        lambda k, gg: jnp.zeros((n * C,), g.dtype)
        .at[k.reshape(-1)].add(gg.reshape(-1)))(keys, g)
    return df.reshape(winner.shape[0], n, C), None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gather_max_slab_vjp(fs, index, off_blk, win: int, spw: int,
                        interpret: bool = False):
    """Differentiable wrapper: d(pooled) routes to the first winning row
    per (query, channel) — the same semantic as ops/pooling.gather_max."""
    return gather_max_slab(fs, index, off_blk, win, spw,
                           interpret=interpret)


gather_max_slab_vjp.defvjp(_gm_slab_fwd, _gm_slab_bwd)

GROUP_WIN, GROUP_SPW = _WIN_GROUP, _SPW_GROUP
CROP_WIN, CROP_SPW = _WIN_CROP, _SPW_CROP
