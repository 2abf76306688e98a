"""Pallas TPU kernel for farthest point sampling.

The lax.scan FPS (ops/fps.py) pays ~10us of XLA loop sequencing per step —
at 5120 samples that's ~50ms, the largest single op in the pipeline after
the bucket-selection rewrite.  This kernel runs the whole iterative loop
inside one Mosaic program with the cloud and the running distance field
resident in VMEM (25.6k points x 3 coords = 300KB), so each step is a
handful of fused VPU passes: distance to the new centroid, running min,
and a masked argmax.

Replaces ``csrc/sampling_kernel.cu:42-170`` (one CUDA block per batch with
a shared-memory argmax tree); here the grid is (B,) with one program per
batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(num_samples: int, x_ref, y_ref, z_ref, dist_init_ref,
                idx_ref, dist_ref):
    """Coords + running distance laid out [N/128, 128] (full VPU tiles;
    a [1, N] layout would waste 7/8 sublanes) -> idx [1, S] in SMEM.

    idx_ref lives in SMEM (scalar stores at dynamic offsets are legal
    there; Mosaic requires 128-aligned dynamic VMEM accesses).  The
    centroid coordinates are extracted with a masked reduction instead of
    a dynamic VMEM load for the same reason.
    """
    dist_ref[:] = dist_init_ref[:]
    rows, lanes = x_ref.shape
    n = rows * lanes
    # row-major linear index per element — matches jnp.argmax's flattened
    # index order
    ids = (lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes
           + lax.broadcasted_iota(jnp.int32, (rows, lanes), 1))

    def argmax_first(v):
        # Mosaic's argmax tie-break is lane-order dependent; FPS parity
        # needs first-index ties (the CUDA kernel scans ascending).
        m = jnp.max(v)
        return jnp.min(jnp.where(v == m, ids, n)).astype(jnp.int32)

    # First centroid = first valid point.  This step is ALL ties (every
    # valid sentinel equals 1e10) so it needs the deterministic reduction;
    # inside the loop distances are continuous and tie-free, so the
    # cheaper native argmax suffices (tie-breaks there only shuffle
    # duplicate picks in the exhausted-mask edge case).
    start = argmax_first(dist_init_ref[:])

    def body(i, farthest):
        idx_ref[0, i] = farthest
        sel = (ids == farthest)
        zero = jnp.float32(0.0)
        cx = jnp.sum(jnp.where(sel, x_ref[:], zero))
        cy = jnp.sum(jnp.where(sel, y_ref[:], zero))
        cz = jnp.sum(jnp.where(sel, z_ref[:], zero))
        d = (jnp.square(x_ref[:] - cx) + jnp.square(y_ref[:] - cy)
             + jnp.square(z_ref[:] - cz))
        dist = dist_ref[:]
        dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
        dist_ref[:] = dist
        return jnp.argmax(dist).astype(jnp.int32)

    lax.fori_loop(0, num_samples, body, start)


def _fps_kernel_v2(num_samples: int, x_ref, y_ref, z_ref, dist_init_ref,
                   idx_ref, dist_ref):
    """Round-2 kernel: the new centroid's coordinates are extracted from
    ONE aligned (8, 128) tile via `pl.ds` instead of three full-array
    masked reductions — the v1 kernel's dominant per-step cost (6 of ~17
    VPU passes over the full working set).  Distances stay in diff-square
    form so the selected indices remain bit-identical to ops/fps.py's
    lax path (the parity tests assert exact equality)."""
    dist_ref[:] = dist_init_ref[:]
    rows, lanes = x_ref.shape
    n = rows * lanes
    ids = (lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes
           + lax.broadcasted_iota(jnp.int32, (rows, lanes), 1))
    tile_ids = (lax.broadcasted_iota(jnp.int32, (8, lanes), 0) * lanes
                + lax.broadcasted_iota(jnp.int32, (8, lanes), 1))

    def argmax_first(v):
        m = jnp.max(v)
        return jnp.min(jnp.where(v == m, ids, n)).astype(jnp.int32)

    start = argmax_first(dist_init_ref[:])

    def body(i, farthest):
        idx_ref[0, i] = farthest
        # aligned (8, 128) tile holding the centroid
        r0 = (farthest // (8 * lanes)) * 8
        sel = tile_ids == (farthest - r0 * lanes)
        zero = jnp.float32(0.0)
        cx = jnp.sum(jnp.where(sel, x_ref[pl.ds(r0, 8), :], zero))
        cy = jnp.sum(jnp.where(sel, y_ref[pl.ds(r0, 8), :], zero))
        cz = jnp.sum(jnp.where(sel, z_ref[pl.ds(r0, 8), :], zero))
        d = (jnp.square(x_ref[:] - cx) + jnp.square(y_ref[:] - cy)
             + jnp.square(z_ref[:] - cz))
        dist = dist_ref[:]
        dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
        dist_ref[:] = dist
        return jnp.argmax(dist).astype(jnp.int32)

    lax.fori_loop(0, num_samples, body, start)


def _fps_kernel_grouped(s_per: int, groups: int, rows_g: int,
                        x_ref, y_ref, z_ref, dist_init_ref,
                        idx_ref, dist_ref):
    """Stratified FPS: all G slices advance in ONE sequential step.

    The grouped path in ops/fps.py runs exact FPS independently per
    contiguous slice.  Routing the slices through the batch axis (grid)
    serializes them on the single TensorCore, so the sequential step
    count stays S and the measured win is only the smaller per-step
    working set (~1.3x, tools/ab_kernels.py).  Here one program holds
    all G slices as static row segments of the same VMEM arrays and each
    fori_loop step updates every slice: S/G sequential steps, each doing
    the same total VPU work as one exact step — the G-fold depth
    reduction the stratified decomposition promises.

    Layout: [G * rows_g, 128] with each slice independently padded to
    rows_g rows (multiple of 8 -> all static segment slices and the
    dynamic `pl.ds(seg + r0, 8)` centroid loads stay (8,128)-aligned).
    idx_ref [1, G * s_per] in SMEM, slice-major — matching the batch
    path's output order so indices are bit-identical.
    """
    dist_ref[:] = dist_init_ref[:]
    lanes = 128
    n_seg = rows_g * lanes
    seg_ids = (lax.broadcasted_iota(jnp.int32, (rows_g, lanes), 0) * lanes
               + lax.broadcasted_iota(jnp.int32, (rows_g, lanes), 1))
    tile_ids = (lax.broadcasted_iota(jnp.int32, (8, lanes), 0) * lanes
                + lax.broadcasted_iota(jnp.int32, (8, lanes), 1))

    # First pick per slice: all-ties over the 1e10 valid sentinel, so it
    # needs the deterministic first-index reduction (see _fps_kernel).
    starts = []
    for g in range(groups):
        v = dist_init_ref[g * rows_g:(g + 1) * rows_g, :]
        m = jnp.max(v)
        starts.append(jnp.min(jnp.where(v == m, seg_ids, n_seg))
                      .astype(jnp.int32))

    def body(i, farthest):
        nxt = []
        for g in range(groups):
            f = farthest[g]
            idx_ref[0, g * s_per + i] = f
            base = g * rows_g
            r0 = (f // (8 * lanes)) * 8
            sel = tile_ids == (f - r0 * lanes)
            zero = jnp.float32(0.0)
            cx = jnp.sum(jnp.where(sel, x_ref[pl.ds(base + r0, 8), :], zero))
            cy = jnp.sum(jnp.where(sel, y_ref[pl.ds(base + r0, 8), :], zero))
            cz = jnp.sum(jnp.where(sel, z_ref[pl.ds(base + r0, 8), :], zero))
            xd = x_ref[base:base + rows_g, :]
            yd = y_ref[base:base + rows_g, :]
            zd = z_ref[base:base + rows_g, :]
            d = (jnp.square(xd - cx) + jnp.square(yd - cy)
                 + jnp.square(zd - cz))
            dist = dist_ref[base:base + rows_g, :]
            dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
            dist_ref[base:base + rows_g, :] = dist
            nxt.append(jnp.argmax(dist).astype(jnp.int32))
        return tuple(nxt)

    lax.fori_loop(0, s_per, body, tuple(starts))


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "groups", "interpret"))
def fps_pallas_grouped(xyz: jax.Array, dist_init: jax.Array,
                       num_samples: int, groups: int,
                       interpret: bool = False) -> jax.Array:
    """Stratified grouped FPS, all slices in lockstep (see kernel above).

    Args/semantics match ops/fps.py's groups>1 path: xyz [B, N, 3] split
    into `groups` contiguous slices of L = N/groups points; exact FPS of
    num_samples/groups runs per slice; returns [B, num_samples] int32
    indices into N, slice-major with slice offsets applied — bit-identical
    to routing the slices through the batch axis.
    """
    B, N, _ = xyz.shape
    assert N % groups == 0 and num_samples % groups == 0
    L = N // groups
    s_per = num_samples // groups
    pad = (-L) % (128 * 8)
    rows_g = (L + pad) // 128
    xyz = xyz.astype(jnp.float32).reshape(B, groups, L, 3)
    dist_init = dist_init.reshape(B, groups, L)
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, 0), (0, pad), (0, 0)))
        dist_init = jnp.pad(dist_init, ((0, 0), (0, 0), (0, pad)),
                            constant_values=-1.0)
    rows = groups * rows_g
    coords = [xyz[..., c].reshape(B, rows, 128) for c in range(3)]
    dist2d = dist_init.reshape(B, rows, 128)

    coord_spec = pl.BlockSpec((None, rows, 128), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel_grouped, s_per, groups, rows_g),
        grid=(B,),
        in_specs=[coord_spec] * 4,
        out_specs=pl.BlockSpec((None, 1, num_samples), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
    )(*coords, dist2d)
    idx = out[:, 0, :].reshape(B, groups, s_per)
    offs = (jnp.arange(groups, dtype=jnp.int32) * L)[None, :, None]
    return (idx + offs).reshape(B, num_samples)


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "version", "interpret"))
def fps_pallas(xyz: jax.Array, dist_init: jax.Array,
               num_samples: int, version: int = 1,
               interpret: bool = False) -> jax.Array:
    """Batched Pallas FPS.

    Args:
      xyz: [B, N, 3] float32 points.
      dist_init: [B, N] float32 — 1e10 for selectable points, -1.0 for
        masked-out points (they only get picked once every valid point is
        exhausted, matching ops/fps.py semantics).
      num_samples: S (static).
      version: 1 = masked-reduction centroid extraction, 2 = aligned-tile
        `pl.ds` extraction (same indices, fewer VPU passes).

    Returns:
      [B, S] int32 indices.
    """
    B, N, _ = xyz.shape
    pad = (-N) % (128 * 8)      # full (8, 128) f32 tiles
    xyz = xyz.astype(jnp.float32)
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
        dist_init = jnp.pad(dist_init, ((0, 0), (0, pad)),
                            constant_values=-1.0)
    Np = N + pad
    rows = Np // 128
    coords = [xyz[..., c].reshape(B, rows, 128) for c in range(3)]
    dist2d = dist_init.reshape(B, rows, 128)

    kernel = _fps_kernel_v2 if version == 2 else _fps_kernel
    coord_spec = pl.BlockSpec((None, rows, 128), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, num_samples),
        grid=(B,),
        in_specs=[coord_spec] * 4,
        out_specs=pl.BlockSpec((None, 1, num_samples), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
    )(*coords, dist2d)
    return out[:, 0, :]
