"""Mesh-parallel scene evaluation == the sequential evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
from regnet_for_3d_grasping_tpu.eval.evaluator import (
    EvalRecord,
    evaluate_scene_grasps,
)
from regnet_for_3d_grasping_tpu.eval.parallel_eval import (
    evaluate_scenes_sharded,
)
from regnet_for_3d_grasping_tpu.parallel.mesh import make_mesh
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


def _scene_grasps(scene, rng, n):
    """n plausible grasps: some near GT frames, some junk."""
    frames = np.asarray(scene["select_frame"], np.float32)
    g = np.zeros((n, 8), np.float32)
    for i in range(n):
        if i % 3 == 2 or len(frames) == 0:      # junk grasp
            g[i, :3] = rng.uniform(-0.2, 0.2, 3)
            g[i, 2] = rng.uniform(0.70, 0.85)
            v = rng.standard_normal(3)
            g[i, 3:6] = v / np.linalg.norm(v)
            g[i, 6] = rng.uniform(-1, 1)
        else:                                    # GT-derived grasp
            f = frames[rng.integers(0, len(frames))]
            g[i, :3] = f[:, 3]
            g[i, 3:6] = f[:, 1]
            g[i, 6] = 0.0
        g[i, 7] = rng.uniform(0, 1)
    return g


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_sequential():
    cfg = tiny_config()
    g = cfg.gripper
    rng = np.random.default_rng(0)

    scenes, grasps_list, depths_list, view_nums = [], [], [], []
    counts = [5, 17, 2, 9, 31]                # ragged on purpose
    for i, n in enumerate(counts):
        s = make_synthetic_scene(300 + i, num_view=cfg.region.num_points)
        scenes.append(s)
        gr = _scene_grasps(s, rng, n)
        grasps_list.append(gr)
        depths_list.append(np.full(n, g.depth, np.float32))
        view_nums.append(i % 4)

    seq = [evaluate_scene_grasps(
        s, gr, vn, g.table_height, dp, g.width, g, cfg.eval)
        for s, gr, vn, dp in zip(scenes, grasps_list, view_nums,
                                 depths_list)]

    mesh = make_mesh()
    par = evaluate_scenes_sharded(
        mesh, scenes, grasps_list, view_nums, g.table_height,
        depths_list, g.width, g, cfg.eval)

    assert len(par) == len(seq)
    total_seq, total_par = EvalRecord(), EvalRecord()
    for i, (a, b) in enumerate(zip(seq, par)):
        np.testing.assert_allclose(
            np.asarray(tuple(b)), np.asarray(tuple(a)),
            rtol=1e-6, atol=1e-6, err_msg=f"scene {i}")
        total_seq = total_seq.add(a)
        total_par = total_par.add(b)
    # aggregate metrics identical
    np.testing.assert_allclose(total_par.vgr, total_seq.vgr, rtol=1e-6)
    np.testing.assert_allclose(total_par.score, total_seq.score,
                               rtol=1e-6)
    # sanity: the suite actually exercises non-trivial metrics
    assert total_seq.formal == sum(counts)
    assert total_seq.nocoll_view > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_without_precomputed_normals():
    cfg = tiny_config()
    g = cfg.gripper
    rng = np.random.default_rng(1)
    scenes, grasps_list, depths_list, view_nums = [], [], [], []
    for i, n in enumerate([7, 12]):
        s = dict(make_synthetic_scene(400 + i,
                                      num_view=cfg.region.num_points))
        s.pop("scene_normal")
        scenes.append(s)
        gr = _scene_grasps(s, rng, n)
        grasps_list.append(gr)
        depths_list.append(np.full(n, g.depth, np.float32))
        view_nums.append(i)

    seq = [evaluate_scene_grasps(
        s, gr, vn, g.table_height, dp, g.width, g, cfg.eval)
        for s, gr, vn, dp in zip(scenes, grasps_list, view_nums,
                                 depths_list)]
    par = evaluate_scenes_sharded(
        make_mesh(), scenes, grasps_list, view_nums, g.table_height,
        depths_list, g.width, g, cfg.eval)
    for a, b in zip(seq, par):
        # in-body normals run on the padded cloud -> identical masks, but
        # the moment centroid shifts by the pad fraction; counts are ints
        # and must match exactly, the antipodal sum within float noise
        assert b.vgr_count == a.vgr_count
        assert b.nocoll_view == a.nocoll_view
        assert b.formal == a.formal
        np.testing.assert_allclose(b.score_sum, a.score_sum,
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_per_scene_table_heights():
    """Randomized-layout scenes put every table at a different z; the
    sharded evaluator takes per-scene heights and must match the
    sequential evaluator at each scene's own height."""
    cfg = tiny_config()
    g = cfg.gripper
    rng = np.random.default_rng(2)
    scenes, grasps_list, depths_list, view_nums, heights = [], [], [], [], []
    for i, n in enumerate([6, 14, 9]):
        s = make_synthetic_scene(500 + i, num_view=cfg.region.num_points,
                                 layout="randomized")
        scenes.append(s)
        heights.append(float(s["table_height"]))
        gr = _scene_grasps(s, rng, n)
        grasps_list.append(gr)
        depths_list.append(np.full(n, g.depth, np.float32))
        view_nums.append(i % 4)
    assert len(set(heights)) == len(heights)   # genuinely mixed

    seq = [evaluate_scene_grasps(
        s, gr, vn, th, dp, g.width, g, cfg.eval)
        for s, gr, vn, th, dp in zip(scenes, grasps_list, view_nums,
                                     heights, depths_list)]
    par = evaluate_scenes_sharded(
        make_mesh(), scenes, grasps_list, view_nums, heights,
        depths_list, g.width, g, cfg.eval)
    for i, (a, b) in enumerate(zip(seq, par)):
        np.testing.assert_allclose(
            np.asarray(tuple(b)), np.asarray(tuple(a)),
            rtol=1e-6, atol=1e-6, err_msg=f"scene {i}")
