"""Vectorized gripper collision checking and antipodal scoring.

Re-design of ``eval_utils/evaluation_data_generator.py``: the reference
iterates grasps one by one in Python with early returns
(finger_hand_view :420-483, finger_hand_scene :485-538) — the dominant
eval-time cost (SURVEY §3 hot loops).  Here every grasp is checked
simultaneously; the early returns become boolean conjunctions, chunked over
grasps to bound the [G, N] point-transform workspace.

Geometry/thresholds from ``eval_score/configs/config.py`` (EvalConfig):
  close plane    -BOTTOM_LENGTH < x_local < depth, needs >= 16 points
  hand slab      |z_local| < HALF_HAND_THICKNESS
  back collision |y| < w/2+fw, x < -margin, in slab -> 0 tolerated
  finger region  w/2 < |y| < w/2+fw, in slab        -> 0 tolerated
  close region   |y| < w/2, in slab; >= 16 points (validate path only)
  antipodal      mean |n.y| over the two finger contact bands, multiplied
                 (evaluation_data_generator.py:397-418)

The reference's table-corner check (_table_collision_check :382-395) is
computed but its result is never used to reject a grasp — dead code, not
reproduced.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.geometry.codec import grasps_to_frames
from regnet_for_3d_grasping_tpu.utils.config import EvalConfig, GripperConfig


def _local_coords(points: jax.Array, frame: jax.Array,
                  center: jax.Array) -> jax.Array:
    """points [N,3], frame [G,3,3], center [G,3] -> [G,N,3] local coords."""
    rel = points[None, :, :] - center[:, None, :]
    return jnp.einsum("gij,gnj->gni", jnp.swapaxes(frame, -1, -2), rel,
                      precision=lax.Precision.HIGHEST)


def _region_masks(local: jax.Array, depth, gripper: GripperConfig,
                  cfg: EvalConfig):
    x, y, z = local[..., 0], local[..., 1], local[..., 2]
    close_plane = (x > -gripper.bottom_length) & (x < depth)
    slab = jnp.abs(z) < gripper.half_hand_thickness
    hw = gripper.hand_half_bottom_width
    hs = gripper.hand_half_bottom_space
    back = close_plane & slab & (jnp.abs(y) < hw) \
        & (x < -cfg.back_collision_margin)
    finger = close_plane & slab & (jnp.abs(y) > hs) & (jnp.abs(y) < hw)
    close_region = close_plane & slab & (jnp.abs(y) < hs)
    return close_plane, back, finger, close_region


def check_grasps_view(points: jax.Array, grasps: jax.Array,
                      table_height: float, depth, gripper: GripperConfig,
                      cfg: EvalConfig, require_close_region: bool,
                      table_sign: float = -1.0,
                      chunk: int = 256) -> jax.Array:
    """View-cloud collision filter.

    Args:
      points: [N, 3] view cloud.
      grasps: [G, 8] (center, axis_y, theta, score).
      table_height: scene table z.
      depth: scalar or [G] finger depth.
      require_close_region: True for the validate path (>=16 points in the
        closing region, evaluation_data_generator.py:474-479), False for
        the test path (EvalDataTest has no such check).
      table_sign: the fingertip-below-table test uses
        ``tip_z < table_height + sign*0.005`` — the reference flips the
        sign between test (+, :186) and validate (-, :428).

    Returns:
      [G] bool — grasp survives the view collision check.
    """
    frames, centers = grasps_to_frames(grasps)
    G = grasps.shape[0]
    depth = jnp.broadcast_to(jnp.asarray(depth, jnp.float32), (G,))

    tip_z = centers[:, 2] + frames[:, 2, 0] * depth
    above_table = tip_z >= table_height + table_sign * cfg.table_offset

    pad = (-G) % chunk
    if pad:
        frames = jnp.concatenate(
            [frames, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))])
        centers = jnp.concatenate([centers, jnp.zeros((pad, 3))])
        depth = jnp.concatenate([depth, jnp.ones((pad,))])
    n_chunks = frames.shape[0] // chunk

    def per_chunk(args):
        fr, ce, dp = args
        local = _local_coords(points, fr, ce)
        close_plane, back, finger, close_region = _region_masks(
            local, dp[:, None], gripper, cfg)
        n_close = jnp.sum(close_plane, axis=-1)
        ok = (n_close >= cfg.num_points_threshold) \
            & (jnp.sum(back, axis=-1) <= cfg.back_collision_threshold) \
            & (jnp.sum(finger, axis=-1) <= cfg.finger_collision_threshold)
        if require_close_region:
            ok = ok & (jnp.sum(close_region, axis=-1)
                       >= cfg.close_region_min_points)
        return ok

    ok = lax.map(per_chunk, (
        frames.reshape(n_chunks, chunk, 3, 3),
        centers.reshape(n_chunks, chunk, 3),
        depth.reshape(n_chunks, chunk))).reshape(-1)[:G]
    return ok & above_table


def view_check_funnel(points: jax.Array, grasps: jax.Array,
                      table_height: float, depth,
                      gripper: GripperConfig, cfg: EvalConfig,
                      table_sign: float = +1.0,
                      chunk: int = 256) -> dict:
    """Per-grasp reason masks for the view collision filter — the
    survival funnel (above-table -> enough close-plane points -> no back
    collision -> no finger collision), matching the reference's early
    returns in finger_hand_view (evaluation_data_generator.py:420-483)
    but exposing WHICH check rejected each grasp.

    Returns dict of [G] bool arrays: above_table, close_points, back_ok,
    finger_ok, close_region_ok, survive (test-path conjunction — without
    close_region_ok, as EvalDataTest has no such check)."""
    frames, centers = grasps_to_frames(grasps)
    G = grasps.shape[0]
    depth = jnp.broadcast_to(jnp.asarray(depth, jnp.float32), (G,))

    tip_z = centers[:, 2] + frames[:, 2, 0] * depth
    above_table = tip_z >= table_height + table_sign * cfg.table_offset

    pad = (-G) % chunk
    if pad:
        frames = jnp.concatenate(
            [frames, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))])
        centers = jnp.concatenate([centers, jnp.zeros((pad, 3))])
        depth = jnp.concatenate([depth, jnp.ones((pad,))])
    n_chunks = frames.shape[0] // chunk

    def per_chunk(args):
        fr, ce, dp = args
        local = _local_coords(points, fr, ce)
        close_plane, back, finger, close_region = _region_masks(
            local, dp[:, None], gripper, cfg)
        return (jnp.sum(close_plane, axis=-1) >= cfg.num_points_threshold,
                jnp.sum(back, axis=-1) <= cfg.back_collision_threshold,
                jnp.sum(finger, axis=-1) <= cfg.finger_collision_threshold,
                jnp.sum(close_region, axis=-1)
                >= cfg.close_region_min_points)

    cp, bk, fg, cr = lax.map(per_chunk, (
        frames.reshape(n_chunks, chunk, 3, 3),
        centers.reshape(n_chunks, chunk, 3),
        depth.reshape(n_chunks, chunk)))
    cp, bk, fg, cr = (m.reshape(-1)[:G] for m in (cp, bk, fg, cr))
    return {
        "above_table": above_table,
        "close_points": cp,
        "back_ok": bk,
        "finger_ok": fg,
        "close_region_ok": cr,
        "survive": above_table & cp & bk & fg,
    }


def check_grasps_scene(points: jax.Array, normals: jax.Array,
                       grasps: jax.Array, depth, gripper: GripperConfig,
                       cfg: EvalConfig,
                       chunk: int = 64) -> Tuple[jax.Array, jax.Array]:
    """Dense-scene collision check + antipodal score.

    Args:
      points: [N2, 3] dense scene cloud, normals: [N2, 3].
      grasps: [G, 8].

    Returns:
      (collision_free [G] bool, antipodal_score [G] float).
    """
    frames, centers = grasps_to_frames(grasps)
    G = grasps.shape[0]
    depth = jnp.broadcast_to(jnp.asarray(depth, jnp.float32), (G,))

    pad = (-G) % chunk
    if pad:
        frames = jnp.concatenate(
            [frames, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))])
        centers = jnp.concatenate([centers, jnp.zeros((pad, 3))])
        depth = jnp.concatenate([depth, jnp.ones((pad,))])
    n_chunks = frames.shape[0] // chunk

    def per_chunk(args):
        fr, ce, dp = args
        local = _local_coords(points, fr, ce)               # [g,N,3]
        n_local = jnp.einsum(
            "gij,nj->gni", jnp.swapaxes(fr, -1, -2), normals,
            precision=lax.Precision.HIGHEST)
        close_plane, back, finger, close_region = _region_masks(
            local, dp[:, None], gripper, cfg)
        ok = (jnp.sum(close_plane, axis=-1) >= cfg.num_points_threshold) \
            & (jnp.sum(back, axis=-1) <= cfg.back_collision_threshold) \
            & (jnp.sum(finger, axis=-1) <= cfg.finger_collision_threshold) \
            & (jnp.sum(close_region, axis=-1)
               >= cfg.close_region_min_points)

        # antipodal score over the closing region (eval:397-418)
        y = local[..., 1]
        big = jnp.float32(1e9)
        left_y = jnp.max(jnp.where(close_region, y, -big), axis=-1)
        right_y = jnp.min(jnp.where(close_region, y, big), axis=-1)
        nsd = jnp.minimum((left_y - right_y) / 3.0, cfg.neighbor_depth)
        left_band = close_region & (y > (left_y - nsd)[:, None])
        right_band = close_region & (y < (right_y + nsd)[:, None])
        ny = jnp.abs(n_local[..., 1])

        def band_mean(band):
            cnt = jnp.sum(band, axis=-1)
            s = jnp.sum(jnp.where(band, ny, 0.0), axis=-1)
            return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)

        score = band_mean(left_band) * band_mean(right_band)
        return ok, jnp.where(ok, score, 0.0)

    ok, score = lax.map(per_chunk, (
        frames.reshape(n_chunks, chunk, 3, 3),
        centers.reshape(n_chunks, chunk, 3),
        depth.reshape(n_chunks, chunk)))
    return ok.reshape(-1)[:G], score.reshape(-1)[:G]
