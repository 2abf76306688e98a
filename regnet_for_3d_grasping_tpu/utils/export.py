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
