"""Geometric evaluator tests: normals, collision filter, antipodal score,
and the VGR pipeline on synthetic scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
from regnet_for_3d_grasping_tpu.eval import (
    check_grasps_scene,
    check_grasps_view,
    estimate_normals,
    eval_test,
    eval_validate,
)
from regnet_for_3d_grasping_tpu.eval.evaluator import (
    EvalRecord,
    evaluate_scene_grasps,
    view_num_from_path,
)
from regnet_for_3d_grasping_tpu.eval.normals import smallest_eigvec_3x3
from regnet_for_3d_grasping_tpu.geometry import frames_to_grasps
from regnet_for_3d_grasping_tpu.utils.config import EvalConfig, GripperConfig

GRIPPER = GripperConfig()
ECFG = EvalConfig()
TABLE = 0.75
DEPTH = GRIPPER.depth


class TestEigvec:
    def test_matches_numpy_eigh(self, rng):
        A = rng.randn(50, 3, 3).astype(np.float32)
        A = np.einsum("nij,nkj->nik", A, A)  # PSD
        got = np.asarray(smallest_eigvec_3x3(jnp.asarray(A)))
        w, v = np.linalg.eigh(A)
        expect = v[:, :, 0]
        dots = np.abs(np.sum(got * expect, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)


class TestNormals:
    def test_plane_normals(self, rng):
        pts = np.c_[rng.rand(500, 2).astype(np.float32) * 0.1,
                    np.zeros(500, np.float32)]
        cam = np.array([0, 0, 1.0], np.float32)
        n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(cam)))
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-2)
        assert (n[:, 2] > 0).all()   # oriented toward the camera above

    def test_sphere_normals_radial(self, rng):
        v = rng.randn(800, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v * 0.05
        cam = np.array([0, 0, 10.0], np.float32)
        n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(cam),
                                        radius=0.02))
        # normals should align with the radial direction (up to camera flip)
        dots = np.abs(np.sum(n * v, axis=-1))
        assert np.median(dots) > 0.95

    def test_moment_matches_knn_path(self, rng):
        # A noisy tilted plane, offset far from the origin so the moment
        # path's E[ppT]-mu muT cancellation is stressed; the two
        # neighbourhood definitions (all-in-radius vs 30-nearest-in-radius)
        # coincide when counts stay under max_nn.
        u = rng.rand(600, 2).astype(np.float32) * 0.1
        pts = np.c_[u, (0.3 * u[:, 0] + 0.1 * u[:, 1]
                        + rng.randn(600).astype(np.float32) * 1e-4)]
        pts += np.array([0.4, -0.3, 0.8], np.float32)
        cam = np.array([0, 0, 10.0], np.float32)
        a = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(cam),
                                        method="moment"))
        b = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(cam),
                                        method="knn"))
        dots = np.abs(np.sum(a * b, axis=-1))
        assert np.median(dots) > 0.99


def _world_points(local, center=np.array([0., 0., 1.0])):
    """Identity-frame grasp at `center`: world = local + center."""
    return (np.asarray(local, np.float32) + center).astype(np.float32)


def _grasp(center=np.array([0., 0., 1.0])):
    """Identity-orientation grasp 8-vec (axis_y=+y, theta=0)."""
    return np.array([[*center, 0, 1, 0, 0, 0.9]], np.float32)


def _stick(n=20):
    """Points along the approach axis inside the closing region."""
    return np.c_[np.linspace(0.005, 0.025, n),
                 np.zeros(n), np.zeros(n)]


class TestViewCollision:
    def test_clean_grasp_survives(self):
        pts = _world_points(_stick())
        ok = check_grasps_view(jnp.asarray(pts), jnp.asarray(_grasp()),
                               TABLE, DEPTH, GRIPPER, ECFG,
                               require_close_region=True, table_sign=-1.0)
        assert bool(ok[0])

    def test_too_few_points_rejected(self):
        pts = _world_points(_stick(8))   # < NUM_POINTS_THRESHOLD
        ok = check_grasps_view(jnp.asarray(pts), jnp.asarray(_grasp()),
                               TABLE, DEPTH, GRIPPER, ECFG,
                               require_close_region=True, table_sign=-1.0)
        assert not bool(ok[0])

    def test_back_collision_rejected(self):
        local = np.vstack([_stick(), [[-0.01, 0.0, 0.0]]])
        pts = _world_points(local)
        ok = check_grasps_view(jnp.asarray(pts), jnp.asarray(_grasp()),
                               TABLE, DEPTH, GRIPPER, ECFG,
                               require_close_region=True, table_sign=-1.0)
        assert not bool(ok[0])

    def test_finger_collision_rejected(self):
        local = np.vstack([_stick(), [[0.01, 0.045, 0.0]]])
        pts = _world_points(local)
        ok = check_grasps_view(jnp.asarray(pts), jnp.asarray(_grasp()),
                               TABLE, DEPTH, GRIPPER, ECFG,
                               require_close_region=True, table_sign=-1.0)
        assert not bool(ok[0])

    def test_below_table_rejected(self):
        center = np.array([0., 0., 0.70])
        pts = _world_points(_stick(), center)
        ok = check_grasps_view(jnp.asarray(pts), jnp.asarray(_grasp(center)),
                               TABLE, DEPTH, GRIPPER, ECFG,
                               require_close_region=True, table_sign=-1.0)
        assert not bool(ok[0])

    def test_mixed_batch(self):
        """Several grasps checked simultaneously give per-grasp verdicts."""
        good = _grasp()
        bad = _grasp(np.array([5., 5., 5.]))    # empty region
        grasps = np.concatenate([good, bad])
        pts = _world_points(_stick())
        ok = np.asarray(check_grasps_view(
            jnp.asarray(pts), jnp.asarray(grasps), TABLE, DEPTH, GRIPPER,
            ECFG, require_close_region=True, table_sign=-1.0))
        np.testing.assert_array_equal(ok, [True, False])


class TestSceneAntipodal:
    def _plates(self, normal_axis):
        n = 30
        left = np.c_[np.linspace(0.002, 0.028, n), np.full(n, 0.03),
                     np.zeros(n)]
        right = np.c_[np.linspace(0.002, 0.028, n), np.full(n, -0.03),
                      np.zeros(n)]
        local = np.vstack([left, right])
        normals = np.zeros_like(local)
        normals[:, normal_axis] = 1.0
        return _world_points(local), normals.astype(np.float32)

    def test_parallel_plates_score_high(self):
        pts, normals = self._plates(normal_axis=1)   # normals along y
        ok, score = check_grasps_scene(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(_grasp()),
            DEPTH, GRIPPER, ECFG)
        assert bool(ok[0])
        assert float(score[0]) > 0.95

    def test_wrong_normals_score_low(self):
        pts, normals = self._plates(normal_axis=0)   # normals along x
        ok, score = check_grasps_scene(
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(_grasp()),
            DEPTH, GRIPPER, ECFG)
        assert bool(ok[0])
        assert float(score[0]) < 0.05


class TestEvaluatorFacade:
    def test_eval_test_filters(self):
        pts = _world_points(_stick())
        grasps = np.concatenate([_grasp(), _grasp(np.array([9., 9., 9.]))])
        out = eval_test(pts, grasps, None, TABLE, DEPTH, GRIPPER.width,
                        GRIPPER, ECFG)
        assert out.shape == (1, 8)

    def test_eval_validate_on_synthetic_scene(self):
        scene = make_synthetic_scene(1, num_view=8000)
        frames = scene["select_frame"]      # [K, 3, 4]
        grasps = np.asarray(frames_to_grasps(
            jnp.asarray(frames[:, :3, :3]), jnp.asarray(frames[:, :3, 3]),
            jnp.asarray(scene["select_antipodal_score"][:, None])))
        (vgr_count, score_sum, nocoll_view, view_ok, scene_ok,
         _anti) = eval_validate(
            scene, grasps, 0, TABLE, DEPTH, GRIPPER.width, GRIPPER, ECFG)
        assert 0 <= vgr_count <= len(grasps)
        assert nocoll_view >= vgr_count
        assert score_sum >= 0
        # at least one synthetic top-down grasp should clear the view check
        assert nocoll_view > 0

    def test_record_metrics(self):
        r = EvalRecord(5, 2.5, 10, 20)
        assert r.vgr == 0.5
        assert r.vgr_before == 0.25
        assert r.score == 0.25
        r2 = r.add(EvalRecord(1, 0.5, 2, 4))
        assert r2.vgr_count == 6

    def test_view_num_parsing(self):
        assert view_num_from_path("/x/4080_view_1.p") == 1
        assert view_num_from_path("/x/4080_view_2_noise.p") == 2


class TestThresholdSweep:
    def test_sweep_monotone_counts(self):
        from regnet_for_3d_grasping_tpu.eval.evaluator import (
            evaluate_at_thresholds)
        scene = make_synthetic_scene(2, num_view=8000)
        frames = scene["select_frame"]
        scores = scene["select_antipodal_score"]
        grasps = np.asarray(frames_to_grasps(
            jnp.asarray(frames[:, :3, :3]), jnp.asarray(frames[:, :3, 3]),
            jnp.asarray(scores[:, None])))
        recs = evaluate_at_thresholds(
            scene, grasps, [0.0, 0.6, 0.9], 0, TABLE, DEPTH,
            GRIPPER.width, GRIPPER, ECFG)
        # higher threshold -> fewer formal grasps, never more
        assert recs[0.0].formal >= recs[0.6].formal >= recs[0.9].formal
        assert recs[0.0].formal == len(grasps)

    def test_sweep_matches_per_threshold_eval(self):
        """The single-pass sweep must agree with filtering first and
        running the full evaluator per threshold."""
        from regnet_for_3d_grasping_tpu.eval.evaluator import (
            evaluate_at_thresholds)
        scene = make_synthetic_scene(5, num_view=6000)
        frames = scene["select_frame"]
        scores = scene["select_antipodal_score"]
        grasps = np.asarray(frames_to_grasps(
            jnp.asarray(frames[:, :3, :3]), jnp.asarray(frames[:, :3, 3]),
            jnp.asarray(scores[:, None])))
        recs = evaluate_at_thresholds(
            scene, grasps, [0.0, 0.7], 1, TABLE, DEPTH,
            GRIPPER.width, GRIPPER, ECFG)
        for t in (0.0, 0.7):
            sel = grasps[grasps[:, 7] > t]
            ref = evaluate_scene_grasps(
                scene, sel, 1, TABLE, DEPTH, GRIPPER.width, GRIPPER, ECFG,
                pad_to=0)
            assert recs[t].formal == ref.formal
            assert recs[t].vgr_count == ref.vgr_count
            assert recs[t].nocoll_view == ref.nocoll_view
            np.testing.assert_allclose(recs[t].score_sum, ref.score_sum,
                                       rtol=1e-5)


class TestWidthDepthPlumbing:
    def test_width_from_path(self):
        from regnet_for_3d_grasping_tpu.data import width_from_path
        assert width_from_path("/data/0.080/training_data/1_view_0.p") \
            == pytest.approx(0.08)
        assert width_from_path("/data/0.10/training_data/1_view_0.p") \
            == pytest.approx(0.10)
        # non-numeric and out-of-range directories fall back to default
        assert width_from_path("/data/scenes/training_data/1_view_0.p") \
            == pytest.approx(0.08)
        assert width_from_path("/data/2021/training_data/1_view_0.p") \
            == pytest.approx(0.08)

    def test_dataset_parses_width_directory(self, tmp_path):
        from regnet_for_3d_grasping_tpu.data import (
            GraspDataset, write_synthetic_dataset)
        root = tmp_path / "0.10"
        write_synthetic_dataset(str(root), num_scenes=4, num_view=400)
        ds = GraspDataset(str(root), "train", 400, 32)
        assert float(ds.width) == pytest.approx(0.10)
        batch = next(ds.batches(1, seed=0))
        assert float(batch.width[0]) == pytest.approx(0.10)
        # explicit width still wins
        ds2 = GraspDataset(str(root), "train", 400, 32, width=0.07)
        assert float(ds2.width) == pytest.approx(0.07)

    def test_per_grasp_depth_array_through_facade(self):
        """[G] depth arrays (reference map_param_dict, utils.py:293)
        change accept masks through evaluate_scene_grasps, including the
        sentinel-padding path."""
        scene = make_synthetic_scene(6, num_view=6000)
        frames = scene["select_frame"]
        scores = scene["select_antipodal_score"]
        grasps = np.asarray(frames_to_grasps(
            jnp.asarray(frames[:, :3, :3]), jnp.asarray(frames[:, :3, 3]),
            jnp.asarray(scores[:, None])))
        full = evaluate_scene_grasps(
            scene, grasps, 2, TABLE,
            np.full(len(grasps), DEPTH, np.float32),
            GRIPPER.width, GRIPPER, ECFG, pad_to=16)
        # near-zero depth empties every close plane -> all rejected
        tiny = evaluate_scene_grasps(
            scene, grasps, 2, TABLE,
            np.full(len(grasps), 1e-4, np.float32),
            GRIPPER.width, GRIPPER, ECFG, pad_to=16)
        assert full.nocoll_view > 0
        assert tiny.nocoll_view == 0
        # scalar and constant-array depths agree
        scalar = evaluate_scene_grasps(
            scene, grasps, 2, TABLE, DEPTH, GRIPPER.width, GRIPPER, ECFG,
            pad_to=16)
        assert scalar == full


class TestDepthVariants:
    def test_per_grasp_depth_array(self):
        """Ops accept per-grasp finger depths (reference map_param_dict
        path, utils.py:261-268)."""
        # stick reaches x in (0.005, 0.025); with depth 0.03 the close
        # plane needs >=16 pts -> ok; with depth 0.001 the close plane is
        # nearly empty -> reject
        pts = _world_points(_stick())
        grasps = np.concatenate([_grasp(), _grasp()])
        depths = np.array([0.06, 0.001], np.float32)
        ok = np.asarray(check_grasps_view(
            jnp.asarray(pts), jnp.asarray(grasps), TABLE, depths, GRIPPER,
            ECFG, require_close_region=True, table_sign=-1.0))
        np.testing.assert_array_equal(ok, [True, False])

    def test_table_sign_convention(self):
        """EvalDataTest rejects below table+0.005, EvalDataValidate below
        table-0.005 (evaluation_data_generator.py:186 vs :428)."""
        # identity grasp: tip_z = center_z + frame[2,0]*depth = center_z
        center = np.array([0., 0., TABLE + 0.003])
        pts = _world_points(_stick(), center)
        g = jnp.asarray(_grasp(center))
        ok_test = check_grasps_view(jnp.asarray(pts), g, TABLE, DEPTH,
                                    GRIPPER, ECFG,
                                    require_close_region=False,
                                    table_sign=+1.0)
        ok_val = check_grasps_view(jnp.asarray(pts), g, TABLE, DEPTH,
                                   GRIPPER, ECFG,
                                   require_close_region=False,
                                   table_sign=-1.0)
        assert not bool(ok_test[0])   # 0.003 < +0.005 -> reject
        assert bool(ok_val[0])        # 0.003 > -0.005 -> accept


class TestPointcloudOps:
    def test_radius_outlier_mask(self, rng):
        from regnet_for_3d_grasping_tpu.eval.pointcloud_ops import (
            radius_outlier_mask)
        cluster = rng.rand(50, 3).astype(np.float32) * 0.01
        lone = np.array([[5.0, 5.0, 5.0]], np.float32)
        pts = np.vstack([cluster, lone])
        m = np.asarray(radius_outlier_mask(jnp.asarray(pts), 10, 0.05))
        assert m[:50].all()
        assert not m[50]

    def test_voxel_downsample_mask(self, rng):
        from regnet_for_3d_grasping_tpu.eval.pointcloud_ops import (
            voxel_downsample_mask)
        # 100 points in the same voxel + 5 spread out
        dense = rng.rand(100, 3).astype(np.float32) * 0.001
        spread = (np.arange(5)[:, None] * np.ones(3) * 0.1).astype(
            np.float32) + 0.05
        pts = np.vstack([dense, spread])
        m = np.asarray(voxel_downsample_mask(jnp.asarray(pts), 0.005))
        assert m[:100].sum() <= 2        # dense blob collapses
        assert m[100:].all()             # spread points all kept
        # representative is the lowest index in its voxel
        assert m[0]


class TestRandomizedLayout:
    """Round-5 layout randomization (data/synthetic.py layout kwarg):
    the re-staging must keep GT grasps valid at the scene's own table
    height, and the origin layout must stay bit-identical (the frozen
    suite fingerprints separately pin the latter)."""

    def test_schema_and_composition(self):
        s = make_synthetic_scene(77, num_view=6000, layout="randomized",
                                 color_mode="coherent")
        assert "table_height" in s
        tz = s["table_height"]
        assert 0.44 <= tz <= 0.81
        v = s["view_cloud"]
        assert v.shape == (6000, 3)
        # table plane sits at the declared height
        table_band = np.abs(v[:, 2] - tz) < 0.012
        assert table_band.mean() > 0.4
        assert len(s["select_frame"]) >= 4
        for key in ("view_cloud_color", "view_cloud_score",
                    "view_cloud_label"):
            assert len(s[key]) == 6000

    def test_gt_grasps_survive_at_scene_table_height(self):
        """Rigid re-staging + per-scene table height preserve GT grasp
        validity under the real evaluator."""
        for seed in (78, 79):
            s = make_synthetic_scene(seed, num_view=8000,
                                     layout="randomized")
            frames = s["select_frame"]
            grasps = np.asarray(frames_to_grasps(
                jnp.asarray(frames[:, :3, :3]),
                jnp.asarray(frames[:, :3, 3]),
                jnp.asarray(s["select_antipodal_score"][:, None])))
            rec = evaluate_scene_grasps(
                s, grasps, 0, s["table_height"], DEPTH, GRIPPER.width,
                GRIPPER, ECFG)
            # generation-time validation used the same geometric rules in
            # the canonical frame; the restaged scene must agree for a
            # clear majority (grid-vs-exact normal estimation differs)
            assert rec.nocoll_view >= 0.5 * len(grasps), (seed, rec)

    def test_origin_layout_has_no_table_height_drift(self):
        a = make_synthetic_scene(80, num_view=2000)
        assert a["table_height"] == 0.75

    def test_explicit_factors(self):
        s = make_synthetic_scene(81, num_view=4000, table_z=0.60,
                                 xy_offset=(0.2, -0.1), yaw=0.7,
                                 obj_frac=0.15, floor_frac=0.05,
                                 distractors=1)
        v = s["view_cloud"]
        assert s["table_height"] == 0.60
        assert (np.abs(v[:, 2] - 0.60) < 0.012).mean() > 0.5
        # floor points present well below the table
        assert (v[:, 2] < 0.45).mean() > 0.02


class TestGtRobustLabeling:
    """Round-5 pose-robust GT labeling (data/synthetic.
    _validate_grasps_robust + the --gt-robust CLI knob): candidates must
    survive jittered poses too, killing table-skimming side grasps whose
    validity is tangent to the exact collision test."""

    def test_jitters_zero_equals_plain(self):
        from regnet_for_3d_grasping_tpu.data.synthetic import (
            _validate_grasps, _validate_grasps_robust)
        rng = np.random.RandomState(0)
        pts = rng.rand(3000, 3).astype(np.float32) * 0.2
        pts[:, 2] += 0.75
        nrm = np.tile(np.array([0, 0, 1.0], np.float32), (3000, 1))
        frames = rng.rand(8, 3, 4).astype(np.float32)
        k0, a0 = _validate_grasps(frames, pts, nrm, pts, GRIPPER, ECFG)
        k1, a1 = _validate_grasps_robust(
            frames, pts, nrm, pts, GRIPPER, ECFG, jitters=0,
            rng=np.random.RandomState(1))
        np.testing.assert_array_equal(k0, k1)
        np.testing.assert_array_equal(a0, a1)

    def test_robust_keep_is_subset(self):
        """Robust labeling only removes grasps, never adds."""
        from regnet_for_3d_grasping_tpu.data.synthetic import (
            _validate_grasps, _validate_grasps_robust)
        # build one origin-layout scene's candidates directly
        s = make_synthetic_scene(13, num_view=6000)
        frames = s["select_frame"]  # already-validated GT frames
        pts = s["view_cloud"].astype(np.float32)
        nrm = s["view_cloud_normal"].astype(np.float32) \
            if "view_cloud_normal" in s else np.tile(
                np.array([0, 0, 1.0], np.float32), (len(pts), 1))
        fr = frames[:, :3, :].astype(np.float32)
        plain, _ = _validate_grasps(fr, pts, nrm, pts, GRIPPER, ECFG)
        robust, _ = _validate_grasps_robust(
            fr, pts, nrm, pts, GRIPPER, ECFG, jitters=6,
            rng=np.random.RandomState(2))
        assert not (robust & ~plain).any()

    def test_scene_level_gating(self):
        """gt_robust scenes produce valid GT; labels are a (possibly
        strict) subset property is covered above — here: schema intact
        and the robust scene still carries enough grasps to train on."""
        s = make_synthetic_scene(17, num_view=6000, gt_robust=4)
        assert len(s["select_frame"]) >= 4
        assert (s["select_antipodal_score"] >= 0.3).all()

    def test_dense_top_only_with_gt_robust(self):
        """gt_robust=0 must leave the candidate stream untouched (the
        frozen-suite fingerprints depend on it)."""
        a = make_synthetic_scene(19, num_view=4000)
        b = make_synthetic_scene(19, num_view=4000, gt_robust=0)
        np.testing.assert_array_equal(a["view_cloud"], b["view_cloud"])
        np.testing.assert_array_equal(a["select_frame"], b["select_frame"])
