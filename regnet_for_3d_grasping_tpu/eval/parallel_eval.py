"""Mesh-parallel geometric evaluation: one scene per device.

The reference evaluates validation grasps scene-by-scene in a host loop
(``utils.py:270-355`` calling ``eval_validate`` per sample); the trainer
here did the same, leaving every device but one idle during ``--eval-
grasps`` epochs (~4x the epoch wall time at --eval-every 4,
docs/evidence/TRAINING.md).  This module applies the DP-serving pattern
(parallel/infer.py) to the geometric evaluator: scenes are padded to
common shapes, stacked, and ``shard_map``-ped over the ``data`` axis so
the collision/antipodal checks for S scenes run concurrently on S
devices.

Padding rules (all proven no-ops for the metrics):
  * grasps  -> below-table sentinels: rejected by the fingertip check
    (same trick as eval/evaluator.evaluate_scene_grasps); `formal`
    counts use the true pre-pad numbers.
  * clouds  -> a point 1 m above the scene's bounding box: farther than
    any gripper dimension from every real grasp, so it never enters a
    region mask; kept O(1 m) so the moment-normal centering
    (eval/normals.py) keeps its f32 cancellation headroom (a 1e6
    sentinel would destroy it).
  * scenes  -> the batch is padded to a device multiple by repeating the
    last scene; the extra records are dropped on the host.

Gripper width and table height are compile-time constants, so scenes are
grouped by (width, view-camera-independence) per call; the trainer's
datasets are single-width, making this one call per stage in practice.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from regnet_for_3d_grasping_tpu.eval.collision import (
    check_grasps_scene,
    check_grasps_view,
)
from regnet_for_3d_grasping_tpu.eval.evaluator import (
    EvalRecord,
    _camera_for_view,
    _with_width,
)
from regnet_for_3d_grasping_tpu.eval.normals import estimate_normals
from regnet_for_3d_grasping_tpu.utils.config import EvalConfig, GripperConfig


def _pad_cloud(pts: np.ndarray, n: int) -> np.ndarray:
    """Pad [N,3] -> [n,3] with a far-but-O(1m) sentinel point."""
    if len(pts) >= n:
        return pts[:n]
    sentinel = pts.max(axis=0) + 1.0
    return np.concatenate(
        [pts, np.broadcast_to(sentinel, (n - len(pts), 3)).copy()])


def _pad_grasps(grasps: np.ndarray, depths: np.ndarray, g: int):
    """Pad to g rows with below-table sentinels (always rejected)."""
    G = len(grasps)
    if G >= g:
        return grasps[:g], depths[:g]
    sentinel = np.zeros((g - G, grasps.shape[1]), np.float32)
    sentinel[:, 2] = -10.0
    sentinel[:, 3] = 1.0
    return (np.concatenate([grasps, sentinel]),
            np.concatenate([depths, np.ones(g - G, np.float32)]))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_scene_eval_body(gripper: GripperConfig,
                         cfg: EvalConfig, with_normals: bool):
    """Jittable per-shard body: stacked scene arrays -> per-scene counts.

    The table height rides along as a per-scene scalar input (rather
    than a closure constant) so mixed-table-height batches — the
    round-5 `layout="randomized"` training distribution — still
    evaluate in one sharded call."""

    def body(view_pts, scene_pts, scene_n, camera, grasps, depths,
             table_heights):
        def per_scene(args):
            vp, sp, sn, cam, g, dp, th = args
            view_ok = check_grasps_view(
                vp, g, th, dp, gripper, cfg,
                require_close_region=True, table_sign=-1.0)
            if not with_normals:
                sn_local = estimate_normals(
                    sp, cam, cfg.normal_radius, cfg.normal_max_nn,
                    method="moment")
            else:
                sn_local = sn
            scene_ok, antip = check_grasps_scene(
                sp, sn_local, g, dp, gripper, cfg)
            scene_ok = scene_ok & view_ok
            antip = antip * scene_ok
            return (jnp.sum(scene_ok.astype(jnp.float32)),
                    jnp.sum(antip),
                    jnp.sum(view_ok.astype(jnp.float32)))

        return lax.map(per_scene,
                       (view_pts, scene_pts, scene_n, camera, grasps,
                        depths, table_heights))

    return body


def evaluate_scenes_sharded(
        mesh, scenes: Sequence[dict], grasps_list: Sequence[np.ndarray],
        view_nums: Sequence[int], table_height,
        depths_list: Sequence[np.ndarray], width: float,
        gripper: Optional[GripperConfig] = None,
        cfg: Optional[EvalConfig] = None,
        axis_name: str = "data",
        grasp_pad: int = 256) -> List[EvalRecord]:
    """Evaluate S scenes' grasp sets concurrently over the mesh.

    Equivalent (tested in tests/test_parallel_eval.py) to calling
    ``eval/evaluator.evaluate_scene_grasps`` per scene, with one uniform
    `width` per call — group scenes by width upstream when mixed.
    `table_height` may be a scalar or a per-scene sequence (randomized
    layouts put every scene's table at a different z).

    Returns one EvalRecord per input scene (same order).
    """
    gripper = _with_width(gripper, width)
    cfg = cfg or EvalConfig()
    S = len(scenes)
    assert S == len(grasps_list) == len(view_nums) == len(depths_list)
    n_dev = mesh.devices.size

    formals = [float(len(g)) for g in grasps_list]
    Nv = max(len(np.asarray(s["view_cloud"])) for s in scenes)
    Ns = max(len(np.asarray(s["scene_cloud"])) for s in scenes)
    G = _round_up(max(max(len(g) for g in grasps_list), 1), grasp_pad)
    with_normals = all("scene_normal" in s for s in scenes)

    vps, sps, sns, cams, gs, dps = [], [], [], [], [], []
    for s, g, vn, dp in zip(scenes, grasps_list, view_nums, depths_list):
        vps.append(_pad_cloud(
            np.asarray(s["view_cloud"], np.float32)[:, :3], Nv))
        sps.append(_pad_cloud(
            np.asarray(s["scene_cloud"], np.float32)[:, :3], Ns))
        if with_normals:
            sn = np.asarray(s["scene_normal"], np.float32)[:, :3]
            # pad normals alongside their points (sentinel normal +z)
            pad = np.zeros((Ns - len(sn), 3), np.float32)
            pad[:, 2] = 1.0
            sns.append(np.concatenate([sn[:Ns], pad]))
        else:
            sns.append(np.zeros((Ns, 3), np.float32))
        cams.append(_camera_for_view(vn))
        g = np.asarray(g, np.float32)
        dp = np.broadcast_to(np.asarray(dp, np.float32), (len(g),))
        gp, dpp = _pad_grasps(g[:, :8], np.asarray(dp, np.float32), G)
        gs.append(gp)
        dps.append(dpp)

    ths = list(np.broadcast_to(
        np.asarray(table_height, np.float32), (S,)))

    Sp = _round_up(S, n_dev)
    for arr in (vps, sps, sns, cams, gs, dps, ths):
        arr.extend([arr[-1]] * (Sp - S))

    stack = [jnp.asarray(np.stack(a)) for a in (vps, sps, sns, cams, gs,
                                                dps, ths)]

    body = make_scene_eval_body(gripper, cfg, with_normals)
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=tuple(P(axis_name) for _ in stack),
        out_specs=(P(axis_name), P(axis_name), P(axis_name))))
    vgr_count, score_sum, nocoll_view = (np.asarray(r) for r in fn(*stack))

    return [EvalRecord(float(vgr_count[i]), float(score_sum[i]),
                       float(nocoll_view[i]), formals[i])
            for i in range(S)]
