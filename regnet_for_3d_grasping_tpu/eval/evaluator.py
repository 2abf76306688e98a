"""Evaluator facade: VGR / antipodal-score metrics.

Mirrors ``dataset_utils/eval_score/eval.py`` + the aggregation in
``utils.py:270-388``:

  eval_test(points, grasps, ...)     -> view-collision-filtered grasps
  eval_validate(scene_dict, grasps,...) -> (vgr, score, nocoll_view_num, ...)

Metric definitions (utils.py:374-388):
  VGR        = nocoll_scene_num / nocoll_view_num
  vgr_before = nocoll_scene_num / formal_num
  score      = sum(antipodal) / nocoll_view_num
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from regnet_for_3d_grasping_tpu.eval.collision import (
    check_grasps_scene,
    check_grasps_view,
)
from regnet_for_3d_grasping_tpu.eval.normals import estimate_normals
from regnet_for_3d_grasping_tpu.utils.config import EvalConfig, GripperConfig

# camera positions per view index (evaluation_data_generator.py:34-39)
CAMERA_POSE = np.array([
    [0.8, 0.0, 1.7],
    [-0.8, 0.0, 1.6],
    [0.0, 0.75, 1.7],
    [0.0, -0.75, 1.6],
], np.float32)
DEFAULT_CAMERA = np.array([0.0, 0.0, 1.658], np.float32)  # test.py:103


class EvalRecord(NamedTuple):
    """Accumulator matching the reference's record_data 4-tuple
    (nocoll_scene_num, total_score, nocoll_view_num, formal_num)."""

    vgr_count: float = 0.0
    score_sum: float = 0.0
    nocoll_view: float = 0.0
    formal: float = 0.0

    def add(self, other: "EvalRecord") -> "EvalRecord":
        return EvalRecord(*(a + b for a, b in zip(self, other)))

    @property
    def vgr(self) -> float:
        return self.vgr_count / max(self.nocoll_view, 1.0)

    @property
    def vgr_before(self) -> float:
        return self.vgr_count / max(self.formal, 1.0)

    @property
    def score(self) -> float:
        return self.score_sum / max(self.nocoll_view, 1.0)


def _camera_for_view(view_num: Optional[int]) -> np.ndarray:
    if view_num is None:
        return DEFAULT_CAMERA
    return CAMERA_POSE[view_num]


def eval_test(points: np.ndarray, grasps: np.ndarray,
              view_num: Optional[int], table_height: float, depth,
              width: float, gripper: Optional[GripperConfig] = None,
              cfg: Optional[EvalConfig] = None) -> np.ndarray:
    """No-ground-truth path: return grasps surviving the view filter
    (eval.py:4-12 / EvalDataTest)."""
    gripper = _with_width(gripper, width)
    cfg = cfg or EvalConfig()
    if len(grasps) == 0:
        return grasps
    ok = check_grasps_view(
        jnp.asarray(points[:, :3], jnp.float32),
        jnp.asarray(grasps[:, :8], jnp.float32),
        table_height, depth, gripper, cfg,
        require_close_region=False, table_sign=+1.0)
    return np.asarray(grasps)[np.asarray(ok)]


def eval_validate(data: dict, grasps: np.ndarray, view_num: int,
                  table_height: float, depth, width: float,
                  gripper: Optional[GripperConfig] = None,
                  cfg: Optional[EvalConfig] = None):
    """Ground-truth path (eval.py:14-22 / EvalDataValidate.run_collision).

    Returns (vgr_count, score_sum, nocoll_view_num, view_ok_mask,
    scene_ok_mask, antipodal_per_grasp) — counts like the reference's
    run_collision, plus the per-grasp antipodal scores (zero where
    scene_ok is False) so callers can re-aggregate without a second
    collision pass.
    """
    gripper = _with_width(gripper, width)
    cfg = cfg or EvalConfig()
    grasps = np.asarray(grasps, np.float32)
    if len(grasps) == 0:
        return (0.0, 0.0, 0, np.zeros(0, bool), np.zeros(0, bool),
                np.zeros(0, np.float32))

    view_pts = jnp.asarray(np.asarray(data["view_cloud"])[:, :3],
                           jnp.float32)
    g = jnp.asarray(grasps[:, :8])

    view_ok = check_grasps_view(
        view_pts, g, table_height, depth, gripper, cfg,
        require_close_region=True, table_sign=-1.0)

    scene_pts = np.asarray(data["scene_cloud"], np.float32)[:, :3]
    if "scene_normal" in data:
        scene_n = jnp.asarray(np.asarray(data["scene_normal"], np.float32))
    else:
        # method="moment" is the evaluator's documented speed choice
        # (all-in-radius PCA instead of open3d's 30-NN cap; sub-0.5%
        # metric effect — eval/normals.py docstring).  Frozen-suite
        # metrics (tools/holdout_eval.py) are pinned to this setting.
        scene_n = estimate_normals(jnp.asarray(scene_pts),
                                   jnp.asarray(_camera_for_view(view_num)),
                                   cfg.normal_radius, cfg.normal_max_nn,
                                   method="moment")
    scene_ok, antipodal = check_grasps_scene(
        jnp.asarray(scene_pts), scene_n, g, depth, gripper, cfg)

    view_ok = np.asarray(view_ok)
    scene_ok = np.asarray(scene_ok) & view_ok
    antipodal = np.asarray(antipodal) * scene_ok

    vgr_count = float(scene_ok.sum())
    score_sum = float(antipodal.sum())
    nocoll_view = int(view_ok.sum())
    return vgr_count, score_sum, nocoll_view, view_ok, scene_ok, antipodal


def evaluate_scene_grasps(data: dict, grasps: np.ndarray, view_num: int,
                          table_height: float, depth, width: float,
                          gripper: Optional[GripperConfig] = None,
                          cfg: Optional[EvalConfig] = None,
                          pad_to: int = 256) -> EvalRecord:
    """One-call wrapper returning an EvalRecord accumulator entry.

    `pad_to` buckets the grasp count to a multiple of this value with
    sentinel below-table grasps (always rejected by the fingertip check)
    so repeated calls with varying counts reuse a handful of compiled
    shapes instead of one per count — this matters on remote-compile
    backends.  The returned `formal` count is the true grasp count.
    """
    grasps = np.asarray(grasps, np.float32)
    G = len(grasps)
    if pad_to and G:
        pad = (-G) % pad_to
        if pad:
            sentinel = np.zeros((pad, grasps.shape[1]), np.float32)
            sentinel[:, 2] = -10.0     # far below the table
            sentinel[:, 3] = 1.0       # unit axis_y
            grasps = np.concatenate([grasps, sentinel])
            if np.ndim(depth) == 1:    # per-grasp [G] depths: pad to match
                depth = np.concatenate(
                    [np.asarray(depth, np.float32), np.ones(pad, np.float32)])
    vgr_count, score_sum, nocoll_view, _, _, _ = eval_validate(
        data, grasps, view_num, table_height, depth, width, gripper, cfg)
    return EvalRecord(vgr_count, score_sum, float(nocoll_view), float(G))


def evaluate_at_thresholds(data: dict, grasps: np.ndarray,
                           thresholds, view_num: int, table_height: float,
                           depth, width: float,
                           gripper: Optional[GripperConfig] = None,
                           cfg: Optional[EvalConfig] = None) -> dict:
    """VGR/score sweep over prediction-score thresholds.

    The reference sketches this as a disabled branch
    (utils.py:325-352, score_thres).  Returns {threshold: EvalRecord}.

    Single collision pass: the per-grasp view/scene/antipodal results are
    threshold-independent, so they are computed ONCE and the T-threshold
    aggregation happens on the host (a T-fold saving over re-running the
    geometric pipeline per threshold).
    """
    grasps = np.asarray(grasps, np.float32)
    if len(grasps) == 0:
        return {t: EvalRecord() for t in thresholds}
    _, _, _, view_ok, scene_ok, antipodal = eval_validate(
        data, grasps, view_num, table_height, depth, width, gripper, cfg)

    out = {}
    pscore = grasps[:, 7]
    for t in thresholds:
        sel = pscore > t
        out[t] = EvalRecord(
            float((scene_ok & sel).sum()),
            float(antipodal[sel].sum()),
            float((view_ok & sel).sum()),
            float(sel.sum()))
    return out


def view_num_from_path(path: str) -> int:
    """Parse the camera view index from a data filename
    (utils.py:288-291: ``{scene}_view_{v}[_noise].p``)."""
    stem = path.split("/")[-1].split(".")[0]
    parts = stem.split("_")
    if parts[-1] == "noise":
        return int(parts[-2])
    return int(parts[-1])


def _with_width(gripper: Optional[GripperConfig],
                width: float) -> GripperConfig:
    import dataclasses
    base = gripper or GripperConfig()
    if width is not None and width != base.width:
        base = dataclasses.replace(base, width=float(width))
    return base
