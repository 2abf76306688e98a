"""Ground-truth grasp assignment for proposal centers.

Replaces the reference's in-training-loop label loading + matching
(``get_regiondataset.py:45-134``): labels arrive as padded device arrays
from the data pipeline (fixing the np.load-per-step pathology at
get_regiondataset.py:66) and matching is one batched distance computation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from regnet_for_3d_grasping_tpu import ops
from regnet_for_3d_grasping_tpu.geometry.codec import frames_to_grasps


def match_centers_to_gt(
    centers: jax.Array,
    gt_frames: jax.Array,
    gt_scores: jax.Array,
    gt_valid: jax.Array,
    match_dist2: float = 0.005,
) -> Tuple[jax.Array, jax.Array]:
    """Assign each candidate center its nearest ground-truth grasp.

    Args:
      centers: [B, NC, 3] candidate center xyz.
      gt_frames: [B, MG, 3, 4] GT grasp frames (columns x,y,z,translation).
      gt_scores: [B, MG, 3] per-grasp (score, antipodal, center) scores.
      gt_valid: [B, MG] bool padding mask.
      match_dist2: match threshold applied to the SQUARED distance — a
        reference quirk kept for parity (get_regiondataset.py:114 compares
        the un-rooted output of _compute_distance against 0.005).

    Returns:
      grasp_gt: [B, NC, 10] labels (center[3], axis_y[3], theta, score,
        antipodal, center_score); -1 everywhere for unmatched centers
        (get_regiondataset.py:114-120).
      matched: [B, NC] bool.
    """
    gt_center = gt_frames[..., :3, 3]                   # [B, MG, 3]
    d2 = ops.bpdist2(centers, gt_center)                # [B, NC, MG]
    d2 = jnp.where(gt_valid[:, None, :], d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)                      # [B, NC]
    best_d2 = jnp.take_along_axis(d2, best[..., None], axis=-1)[..., 0]
    matched = best_d2 <= match_dist2

    sel_frames = jnp.take_along_axis(
        gt_frames, best[..., None, None], axis=1)       # [B, NC, 3, 4]
    sel_scores = jnp.take_along_axis(
        gt_scores, best[..., None], axis=1)             # [B, NC, 3]

    grasp_gt = frames_to_grasps(
        sel_frames[..., :3, :3], sel_frames[..., :3, 3], sel_scores)
    grasp_gt = jnp.where(matched[..., None], grasp_gt, -1.0)
    return grasp_gt, matched
