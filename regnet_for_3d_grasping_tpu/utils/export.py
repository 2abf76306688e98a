"""Convert masked model outputs into the reference's compact artifacts.

The reference emits dynamically-sized grasp tensors plus per-sample keep
counts (grn:413,424-428; utils.py:237-268 map_grasp_pc).  Here outputs live
on a fixed [B, NC] grid with masks; this module compacts them on the host
for the evaluator / prediction pickles.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from regnet_for_3d_grasping_tpu.models.regnet import REGNetOutput


def extract_grasp_sets(out: REGNetOutput,
                       stage2_mask: np.ndarray | None = None
                       ) -> List[Dict[str, np.ndarray]]:
    """Per-sample compact grasp arrays (first 8 channels, like the saved
    reference pickles: utils.py:412-424).

    Args:
      out: model output (host-fetched or jax arrays).
      stage2_mask: optional [B, NC] — e.g. the GT-matched mask during
        validation; defaults to all proposals (the reference's inference
        behaviour, grn:65).

    Returns one dict per batch element with keys:
      grasp_stage2          — all stage-2 proposals
      grasp_stage3          — refined grasps accepted by the refine cls
      grasp_stage3_stage2   — stage-2 poses of those accepted grasps
      grasp_stage3_score    — accepted grasps above the score threshold
    """
    proposals = np.asarray(out.proposals)[..., :8]
    final = np.asarray(out.final_grasps)[..., :8]
    region_valid = np.asarray(out.region_valid)
    accept = np.asarray(out.refine_accept)
    score_accept = np.asarray(out.score_accept)
    B = proposals.shape[0]
    if stage2_mask is None:
        stage2_mask = region_valid
    else:
        stage2_mask = np.asarray(stage2_mask) & region_valid

    sets = []
    for b in range(B):
        m2 = stage2_mask[b]
        m3 = m2 & accept[b]
        m3s = m2 & score_accept[b]
        sets.append({
            "grasp_stage2": proposals[b][m2],
            "grasp_stage3": final[b][m3],
            "grasp_stage3_stage2": proposals[b][m3],
            "grasp_stage3_score": final[b][m3s],
        })
    return sets


def select_diverse_grasps(grasps: np.ndarray, k: int,
                          min_center_dist: float = 0.03) -> np.ndarray:
    """Score-ordered spatial NMS: the K best mutually-separated grasps.

    A serving-side selector (host numpy, not jitted — it runs on <=4k
    already-accepted grasps).  The reference ships every accepted grasp
    and its vis highlights only the single best (vis_grasp.py); a robot
    planner wants a short list of *diverse* candidates — naive top-K by
    score concentrates near-duplicate grasps on one object patch, so one
    occluded obstacle can fail the entire list (measured:
    docs/evidence/TRAINING.md).  Greedy suppression by grasp-center
    distance keeps one grasp per `min_center_dist` neighbourhood.

    Args:
      grasps: [G, 8] (center[3], axis_y[3], theta, score) rows.
      k: max grasps to keep.
      min_center_dist: suppression radius in meters (~gripper half-width
        default).

    Returns:
      [<=K, 8] selected rows, best score first.
    """
    if len(grasps) == 0 or k <= 0:
        return grasps[:0]
    g = np.asarray(grasps)
    order = np.argsort(-g[:, 7])
    kept: list[int] = []
    centers = g[order, :3]
    for i in range(len(order)):
        c = centers[i]
        if all(np.dot(c - centers[j], c - centers[j])
               >= min_center_dist * min_center_dist for j in kept):
            kept.append(i)
            if len(kept) == k:
                break
    return g[order[kept]]
