"""Proposal-region construction: center selection, radius grouping, and the
gripper closing-region crop.

Replaces the reference's host-side Python loops with fixed-shape batched
device code:

  * ``select_score_centers``  — ``get_regiondataset.py:354-434``
    (threshold + FPS over the positive subset, with the same fallbacks,
    expressed as masked FPS instead of host gather/compaction).
  * ``group_regions``         — ``get_regiondataset.py:279-352``
    (per-(batch,center) np.random.choice loops -> one masked_random_choice).
  * ``closing_region_crop``   — ``gripper_region_network.py:436-550``
    (per-grasp Python loop over box-filtered points -> batched transform +
    masked sampling).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu import ops
from regnet_for_3d_grasping_tpu.ops.sampling import (
    bucket_choice,
    bucket_stride,
    hash_uniform,
    pallas_bucket_stride,
)
from regnet_for_3d_grasping_tpu.geometry.codec import grasps_to_frames
from regnet_for_3d_grasping_tpu.utils.config import GripperConfig


def select_score_centers(pc: jax.Array, score: jax.Array, center_num: int,
                         score_thre: float,
                         groups: int = 1,
                         method: str = "fps",
                         min_z: float | None = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Pick grasp-center candidates among high-graspability points.

    Args:
      pc: [B, N, C] points (xyz first three channels).
      score: [B, N] predicted graspability in [0, 1].
      center_num: number of candidates (static).
      score_thre: positivity threshold.
      method: "fps" (reference semantics, get_regiondataset.py:354-434)
        or "bucket" (serving option — one-pass stratified pick over
        positives, highest score per index bucket; no sequential loop).

    Returns:
      centers [B, center_num, C], index [B, center_num].

    Fallback semantics match the reference: fewer positives than requested
    -> positives are repeated; zero positives -> sample from all points.
    Both are handled inside masked FPS (ops/fps.py) / by widening the
    bucket mask to all points for all-negative rows.

    ``min_z`` (RegionConfig.center_min_z, serving-only) additionally
    restricts candidates to points above the evaluation protocol's table
    plane; rows where that empties fall back to any-point-above-plane,
    then to the unmasked positives (fixed shapes throughout).
    """
    positive = score > score_thre
    if min_z is not None:
        above = pc[..., 2] > min_z
        cand = positive & above
        cand = jnp.where(cand.any(axis=-1, keepdims=True), cand, above)
        positive = jnp.where(cand.any(axis=-1, keepdims=True), cand,
                             positive)
    if method == "bucket":
        # zero-positive rows fall back to all points (reference
        # _select_score_center's random-sampling branch)
        any_pos = positive.any(axis=-1, keepdims=True)
        mask = positive | ~any_pos
        idx, _, _ = ops.bucket_choice(mask, center_num, score=score)
    else:
        idx = ops.farthest_point_sample(pc[..., :3], center_num,
                                        mask=positive, groups=groups)
    return ops.gather_points(pc, idx), idx


class RegionGroups(NamedTuple):
    index: jax.Array    # [B, NC, G] indices into N
    points: jax.Array | None   # [B, NC, G, C] (None when with_points=False)
    valid: jax.Array    # [B, NC] bool — region had >=1 point in radius
    # selection-span origin when the sorted-slab kernel produced `index`
    # (consumed by ops/slab.gather_max_slab); None on the full-scan paths
    slab_off: jax.Array | None = None


def group_stride(nc: int, n: int, group_num: int) -> int:
    """Bucket width of `group_regions`' index output (slot g lies in
    [g*stride, (g+1)*stride) or duplicates an in-window slot) — the
    contract `ops.gather_max` fuses against.  Mirrors the Pallas/XLA
    dispatch, so it must be computed from the same static shapes the
    call used.  (A field on RegionGroups would become a traced leaf
    across jit boundaries; static metadata stays out of the pytree.)"""
    if _use_pallas_group(nc, n, group_num):
        return pallas_bucket_stride(n, group_num)
    return bucket_stride(n, group_num)


def dense_crop_stride(nc: int, n: int, gripper_num: int) -> int:
    """Bucket width of `closing_region_crop_dense`'s index output (see
    `group_stride`)."""
    if _use_pallas_crop(nc, n, gripper_num):
        return pallas_bucket_stride(n, gripper_num)
    return bucket_stride(n, gripper_num)


def group_regions(key: jax.Array, pc: jax.Array, centers: jax.Array,
                  group_num: int, radius: float,
                  center_chunk: int = 1024,
                  with_points: bool = True,
                  sorted_cloud=None, cell: float = 0.0) -> RegionGroups:
    """Sample `group_num` points within `radius` of each center.

    Over-populated regions get a uniform subset without replacement,
    under-populated ones wrap their shuffled members — the static-shape
    equivalent of the reference's np.random.choice(replace=True/False)
    (get_regiondataset.py:330-341).  Chunked over centers to bound the
    [NC, N] distance matrix (matters for the 4000-center inference preset).

    When `sorted_cloud` (ops/slab.SortedCloud over the SAME rows as `pc`)
    is given and the shapes qualify, the sorted-slab kernel dispatches:
    only each center tile's spatial slab is scanned and the selection is
    slab-stratified (ops/slab.py); counts/validity stay exact.
    """
    B, N, _ = pc.shape
    NC = centers.shape[1]
    r2 = jnp.float32(radius * radius)
    xyz = pc[..., :3].astype(jnp.float32)
    cxyz = centers[..., :3].astype(jnp.float32)

    if sorted_cloud is not None and _use_slab_group(N, group_num):
        from regnet_for_3d_grasping_tpu.ops import slab as _slab
        seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[-1]
        idx, count, sel_any, off = _slab.group_slab(
            sorted_cloud, cxyz, seed, radius, group_num, cell,
            interpret=SLAB_INTERPRET)
        valid = (count > 0) & sel_any
        idx = jnp.where(valid[..., None], idx, 0)
        points = ops.group_points(pc, idx) if with_points else None
        return RegionGroups(idx, points, valid, off)

    if _use_pallas_group(NC, N, group_num):
        from regnet_for_3d_grasping_tpu.ops.group_pallas import (
            group_regions_pallas)
        seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[-1]
        idx, count = group_regions_pallas(xyz, cxyz, seed, radius,
                                          group_num)
        valid = count > 0
        idx = jnp.where(valid[..., None], idx, 0)
        points = ops.group_points(pc, idx) if with_points else None
        return RegionGroups(idx, points, valid)

    chunk = min(center_chunk, NC)
    pad = (-NC) % chunk
    if pad:
        cxyz = jnp.concatenate(
            [cxyz, jnp.full((B, pad, 3), 1e10, cxyz.dtype)], axis=1)
    n_chunks = cxyz.shape[1] // chunk
    c_chunks = jnp.moveaxis(cxyz.reshape(B, n_chunks, chunk, 3), 1, 0)
    keys = jax.random.split(key, n_chunks)

    def per_chunk(args):
        c, k = args
        d2 = ops.bpdist2(c, xyz)                     # [B, chunk, N]
        mask = d2 <= r2
        # stratified one-pass pick with random tiebreak — the fast
        # equivalent of np.random.choice over the in-radius set
        # (ops/sampling.bucket_choice; cloud index order is random)
        noise = hash_uniform(k, mask.shape)
        idx, any_valid, _ = bucket_choice(mask, group_num, score=noise)
        idx = jnp.where(any_valid[..., None], idx, 0)
        return idx, any_valid

    idx, valid = lax.map(per_chunk, (c_chunks, keys))
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, -1, group_num)[:, :NC]
    valid = jnp.moveaxis(valid, 0, 1).reshape(B, -1)[:, :NC]
    points = ops.group_points(pc, idx) if with_points else None
    return RegionGroups(idx.astype(jnp.int32), points, valid)


def group_regions_two_scales(
    key: jax.Array, pc: jax.Array, centers: jax.Array,
    group_num: int, radius: float,
    group_num_more: int, radius_more: float,
    center_chunk: int = 1024,
    with_points: bool = True,
) -> Tuple[RegionGroups, RegionGroups]:
    """Both region scales from ONE distance matrix.

    The reference computes the center->point distances twice
    (get_grasp_allobj calls _get_group_pc per scale,
    get_regiondataset.py:36-37); the two scales share centers, so one
    bpdist2 pass feeds both radius masks.
    """
    B, N, _ = pc.shape
    NC = centers.shape[1]
    r2a = jnp.float32(radius * radius)
    r2b = jnp.float32(radius_more * radius_more)
    xyz = pc[..., :3].astype(jnp.float32)
    cxyz = centers[..., :3].astype(jnp.float32)

    chunk = min(center_chunk, NC)
    pad = (-NC) % chunk
    if pad:
        cxyz = jnp.concatenate(
            [cxyz, jnp.full((B, pad, 3), 1e10, cxyz.dtype)], axis=1)
    n_chunks = cxyz.shape[1] // chunk
    c_chunks = jnp.moveaxis(cxyz.reshape(B, n_chunks, chunk, 3), 1, 0)
    keys = jax.random.split(key, n_chunks * 2).reshape(n_chunks, 2, -1)

    def per_chunk(args):
        c, k = args
        d2 = ops.bpdist2(c, xyz)
        out = []
        for r2, g, kk in ((r2a, group_num, k[0]), (r2b, group_num_more,
                                                   k[1])):
            mask = d2 <= r2
            noise = hash_uniform(kk, mask.shape)
            idx, any_valid, _ = bucket_choice(mask, g, score=noise)
            out.append((jnp.where(any_valid[..., None], idx, 0),
                        any_valid))
        return tuple(out)

    (ia, va), (ib, vb) = lax.map(per_chunk, (c_chunks, keys))

    def finish(idx, valid, g):
        idx = jnp.moveaxis(idx, 0, 1).reshape(B, -1, g)[:, :NC]
        valid = jnp.moveaxis(valid, 0, 1).reshape(B, -1)[:, :NC]
        return RegionGroups(
            idx.astype(jnp.int32),
            ops.group_points(pc, idx) if with_points else None, valid)

    return finish(ia, va, group_num), finish(ib, vb, group_num_more)


class ClosingRegion(NamedTuple):
    points: jax.Array | None  # [B, NC, K, C] gripper-frame xyz + colors
    index_in_all: jax.Array   # [B, NC, K] indices into the full cloud
    valid: jax.Array          # [B, NC] bool — > min_points in the gripper
    # see RegionGroups.slab_off
    slab_off: jax.Array | None = None


def closing_region_crop(key: jax.Array, pc: jax.Array,
                        group_index: jax.Array, grasp: jax.Array,
                        gripper: GripperConfig, gripper_num: int,
                        min_points: int = 5,
                        with_points: bool = True) -> ClosingRegion:
    """Crop the points inside each proposed gripper's closing volume.

    Args:
      key: PRNG key (point subsampling).
      pc: [B, N, C] the full cloud (world frame, xyz first).
      group_index: [B, NC, GM] wide-region point indices into N.
      grasp: [B, NC, >=7] proposed grasps (center, axis_y, theta, ...).
      gripper: gripper geometry; box is x in (0, depth/2), |y| < width/2,
        |z| < height/2 (gripper_region_network.py:512-531).
      gripper_num: K points to keep per proposal.
      min_points: proposals with <= this many inside points are invalid
        (reference requires len(index) > 5, grn:539).
      with_points: also materialize the K gripper-frame points + colors
        (the cascade only consumes `index_in_all`, so the model passes
        False and skips those gathers).

    Returns:
      ClosingRegion with gripper-frame coordinates (xyz transformed, colors
      passed through — grn:540) when with_points, else points=None.
    """
    frame, center = grasps_to_frames(grasp)           # [B,NC,3,3], [B,NC,3]
    xyz_g = ops.group_points(pc[..., :3], group_index)  # [B,NC,GM,3]
    rel = xyz_g - center[..., None, :]
    # local = frame^T @ rel  (columns of frame are the gripper axes)
    local = jnp.einsum("...ij,...ki->...kj", frame, rel,
                       precision=lax.Precision.HIGHEST)  # [B,NC,GM,3]

    inside = ((local[..., 0] > 0)
              & (local[..., 0] < gripper.depth / 2)
              & (jnp.abs(local[..., 1]) < gripper.width / 2)
              & (jnp.abs(local[..., 2]) < gripper.height / 2))

    noise = hash_uniform(key, inside.shape)
    idx, any_valid, count = bucket_choice(inside, gripper_num, score=noise)
    idx = jnp.where(any_valid[..., None], idx, 0)
    valid = count > min_points
    index_in_all = jnp.take_along_axis(group_index, idx, axis=-1)

    pts = None
    if with_points:
        local_sel = jnp.take_along_axis(local, idx[..., None], axis=-2)
        color_sel = ops.group_points(pc[..., 3:], index_in_all)
        pts = jnp.concatenate([local_sel, color_sel], axis=-1)
    return ClosingRegion(pts, index_in_all.astype(jnp.int32), valid)


# Above this M*N work the fused Pallas crop/group kernels
# (ops/crop_pallas.py, ops/group_pallas.py) dispatch on TPU; None
# disables them.  Set from tools/ab_kernels.py on the v5e chip
# (2026-08-16): crop Pallas wins 2.0-2.5x at NC*N >= 26M (NC=1024:
# 2.50 vs 5.13 ms; NC=4000: 6.34 vs 15.78 ms) and ties at 6.5M
# (NC=256: 2.17 vs 2.02 ms) -> gate at 16M.  The group kernel LOSES
# at every shape (NC=4000: 6.97 vs 4.32 ms; NC=1024: 2.69 vs 1.76 ms
# — the [NC, K=256] bucket pick doesn't amortize the extra VMEM
# traffic the fused kernel pays), so it stays off.
_PALLAS_CROP_THRESHOLD: int | None = 1 << 24
_PALLAS_GROUP_THRESHOLD: int | None = None

# tests set this to run the sorted-slab kernels in interpret mode on CPU
SLAB_INTERPRET: bool = False


def _use_slab_group(n: int, group_num: int) -> bool:
    from regnet_for_3d_grasping_tpu.ops import slab as _slab
    return (group_num % 64 == 0
            and _slab.group_span_blocks(group_num)
            <= _slab.n_scan_blocks(n)
            and (_on_tpu() or SLAB_INTERPRET))


def use_slab_backbone(n: int, sa1_neighbours: int) -> bool:
    """Can SA1's ball query / the last FP's 3-NN run the slab kernels?
    (models/regnet.py decides the sort-before vs sort-after-backbone
    placement on this.)  SA1's selection geometry is win=256/spw=2 ->
    16 slots per scan block (ops/slab.ball_query_slab)."""
    from regnet_for_3d_grasping_tpu.ops import slab as _slab
    return (sa1_neighbours % 16 == 0
            and _slab.span_blocks_for(sa1_neighbours, 256, 2)
            <= _slab.n_scan_blocks(n)
            and (_on_tpu() or SLAB_INTERPRET))


def _use_slab_crop(n: int, gripper_num: int) -> bool:
    from regnet_for_3d_grasping_tpu.ops import slab as _slab
    return (gripper_num % 8 == 0
            and _slab.crop_span_blocks(gripper_num)
            <= _slab.n_scan_blocks(n)
            and (_on_tpu() or SLAB_INTERPRET))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_crop(m: int, n: int, gripper_num: int) -> bool:
    return (_PALLAS_CROP_THRESHOLD is not None
            and m * n >= _PALLAS_CROP_THRESHOLD
            and gripper_num % 8 == 0 and _on_tpu())


def _use_pallas_group(m: int, n: int, group_num: int) -> bool:
    return (_PALLAS_GROUP_THRESHOLD is not None
            and m * n >= _PALLAS_GROUP_THRESHOLD
            and group_num % 8 == 0 and _on_tpu())


def closing_region_crop_dense(key: jax.Array, pc: jax.Array,
                              grasp: jax.Array, gripper: GripperConfig,
                              gripper_num: int, min_points: int = 5,
                              proposal_chunk: int = 512,
                              sorted_cloud=None,
                              cell: float = 0.0) -> ClosingRegion:
    """Closing-region crop tested against the FULL cloud, gather-free.

    The reference (and `closing_region_crop`) first subsamples a wide
    radius region (`group_num_more`, get_regiondataset.py:37) and crops
    from it — on TPU that indirection costs a ~100MB thin-row gather that
    dominates the refine stage.  Since the gripper box is strictly inside
    the wide-region ball, testing every cloud point directly is equivalent
    (minus the reference's density cap, which only changes the sampling
    distribution when a 6.4cm ball holds >2048 points) and fuses into pure
    VPU passes.  Chunked over proposals to bound the [NC, N] workspace.
    """
    B, N, _ = pc.shape
    NC = grasp.shape[1]
    frame, center = grasps_to_frames(grasp)
    xyz = pc[..., :3].astype(jnp.float32)

    if sorted_cloud is not None and _use_slab_crop(N, gripper_num):
        from regnet_for_3d_grasping_tpu.ops import slab as _slab
        seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[-1]
        box = (0.0, gripper.depth / 2, gripper.width / 2,
               gripper.height / 2)
        idx, count, sel_any, off = _slab.crop_slab(
            sorted_cloud, frame, center, seed, box, gripper_num, cell,
            interpret=SLAB_INTERPRET)
        valid = (count > min_points) & sel_any
        idx = jnp.where(sel_any[..., None], idx, 0)
        return ClosingRegion(None, idx, valid, off)

    if _use_pallas_crop(NC, N, gripper_num):
        from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
            closing_region_crop_pallas)
        seed = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[-1]
        box = (0.0, gripper.depth / 2, gripper.width / 2,
               gripper.height / 2)
        idx, count = closing_region_crop_pallas(
            xyz, frame, center, seed, box, gripper_num)
        idx = jnp.where((count > 0)[..., None], idx, 0)
        return ClosingRegion(None, idx, count > min_points)

    chunk = min(proposal_chunk, NC)
    pad = (-NC) % chunk
    if pad:
        frame = jnp.concatenate(
            [frame, jnp.tile(jnp.eye(3)[None, None], (B, pad, 1, 1))],
            axis=1)
        center = jnp.concatenate(
            [center, jnp.full((B, pad, 3), 1e10)], axis=1)
    n_chunks = frame.shape[1] // chunk
    f_chunks = jnp.moveaxis(
        frame.reshape(B, n_chunks, chunk, 3, 3), 1, 0)
    c_chunks = jnp.moveaxis(center.reshape(B, n_chunks, chunk, 3), 1, 0)
    keys = jax.random.split(key, n_chunks)

    def per_chunk(args):
        fr, ce, k = args                     # [B,chunk,3,3], [B,chunk,3]
        rel = xyz[:, None] - ce[:, :, None]  # [B,chunk,N,3]
        local = jnp.einsum("bcij,bcni->bcnj", fr, rel,
                           precision=lax.Precision.HIGHEST)
        inside = ((local[..., 0] > 0)
                  & (local[..., 0] < gripper.depth / 2)
                  & (jnp.abs(local[..., 1]) < gripper.width / 2)
                  & (jnp.abs(local[..., 2]) < gripper.height / 2))
        noise = hash_uniform(k, inside.shape)
        idx, any_valid, count = bucket_choice(inside, gripper_num,
                                              score=noise)
        idx = jnp.where(any_valid[..., None], idx, 0)
        return idx, count

    idx, count = lax.map(per_chunk, (f_chunks, c_chunks, keys))
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, -1, gripper_num)[:, :NC]
    count = jnp.moveaxis(count, 0, 1).reshape(B, -1)[:, :NC]
    return ClosingRegion(None, idx.astype(jnp.int32), count > min_points)
