"""Codec round-trip property tests (SURVEY §4b) and region-geometry tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu import geometry
from regnet_for_3d_grasping_tpu.utils.config import GripperConfig


def random_rotations(rng, n):
    """Uniform-ish random rotation matrices via QR."""
    q, r = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q.astype(np.float32)


class TestCodec:
    def test_frame_decode_orthonormal(self, rng):
        grasp = np.concatenate([
            rng.randn(50, 3), rng.randn(50, 3),
            rng.uniform(-np.pi, np.pi, (50, 1)), rng.rand(50, 1)],
            axis=1).astype(np.float32)
        frame, center = geometry.grasps_to_frames(jnp.asarray(grasp))
        frame = np.asarray(frame)
        eye = np.einsum("nij,nik->njk", frame, frame)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (50, 1, 1)),
                                   atol=1e-5)
        dets = np.linalg.det(frame)
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(center), grasp[:, :3])

    def test_roundtrip_grasp_to_frame_to_grasp(self, rng):
        """encode(decode(g)) == g for canonical grasps (axis_y.x >= 0)."""
        n = 100
        y = rng.randn(n, 3).astype(np.float32)
        y[:, 0] = np.abs(y[:, 0]) + 1e-3          # canonical
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        theta = rng.uniform(-np.pi * 0.98, np.pi * 0.98, (n, 1)).astype(
            np.float32)
        grasp = np.concatenate(
            [rng.randn(n, 3).astype(np.float32), y, theta,
             rng.rand(n, 1).astype(np.float32)], axis=1)

        frame, center = geometry.grasps_to_frames(jnp.asarray(grasp))
        back = np.asarray(geometry.frames_to_grasps(
            frame, center, jnp.asarray(grasp[:, 7:])))
        np.testing.assert_allclose(back[:, :3], grasp[:, :3], atol=1e-5)
        np.testing.assert_allclose(back[:, 3:6], grasp[:, 3:6], atol=1e-4)
        # angle equality modulo 2pi
        d = np.abs(back[:, 6] - grasp[:, 6])
        d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < 1e-3

    def test_roundtrip_frame_to_grasp_to_frame(self, rng):
        """decode(encode(F)) == F up to the gripper's y-flip symmetry.

        Encoding canonicalizes axis_y.x >= 0, so frames whose axis_y points
        -x decode to [x, -y, -z] — the same physical grasp (two-finger
        grippers are symmetric under y -> -y)."""
        frames = random_rotations(rng, 100)
        centers = rng.randn(100, 3).astype(np.float32)
        scores = rng.rand(100, 1).astype(np.float32)
        grasp = geometry.frames_to_grasps(
            jnp.asarray(frames), jnp.asarray(centers), jnp.asarray(scores))
        back, c2 = np.asarray(geometry.grasps_to_frames(grasp)[0]), \
            np.asarray(geometry.grasps_to_frames(grasp)[1])
        flip = frames[:, 0, 1] < 0           # axis_y.x < 0 was canonicalized
        sign = np.where(flip, -1.0, 1.0)[:, None]
        np.testing.assert_allclose(back[:, :, 0], frames[:, :, 0], atol=1e-3)
        np.testing.assert_allclose(back[:, :, 1], sign * frames[:, :, 1],
                                   atol=1e-3)
        np.testing.assert_allclose(back[:, :, 2], sign * frames[:, :, 2],
                                   atol=1e-3)
        np.testing.assert_allclose(c2, centers)

    def test_flip_canonicalization(self):
        # a frame whose axis_y has negative x must be flipped on encode
        y = np.array([-1.0, 0.1, 0.0])
        y /= np.linalg.norm(y)
        x = np.array([y[1], -y[0], 0.0])
        x /= np.linalg.norm(x)
        z = np.cross(x, y)
        frame = np.stack([x, y, z], axis=1).astype(np.float32)[None]
        g = np.asarray(geometry.frames_to_grasps(
            jnp.asarray(frame), jnp.zeros((1, 3)), jnp.zeros((1, 1))))
        assert g[0, 3] >= 0  # canonical axis_y.x

    def test_anchor_templates(self):
        t = np.asarray(geometry.anchor_templates())
        assert t.shape == (4, 4)
        np.testing.assert_allclose(np.linalg.norm(t[:, :3], axis=1), 1.0,
                                   rtol=1e-5)
        assert (t[:, 0] > 0).all()       # all templates point +x
        assert (t[:, 3] == 0).all()      # theta = 0

    def test_cos_dissimilarity(self):
        a = jnp.array([[1.0, 0, 0], [1, 0, 0], [1, 0, 0]])
        b = jnp.array([[1.0, 0, 0], [-1, 0, 0], [0, 1, 0]])
        d = np.asarray(geometry.cos_dissimilarity(a, b))
        np.testing.assert_allclose(d, [0.0, 2.0, 1.0], atol=1e-5)


class TestCenterSelection:
    def test_selects_positive_points(self, rng):
        pc = rng.randn(2, 64, 6).astype(np.float32)
        score = np.zeros((2, 64), np.float32)
        score[:, 10:40] = 0.9
        centers, idx = geometry.select_score_centers(
            jnp.asarray(pc), jnp.asarray(score), 16, 0.5)
        idx = np.asarray(idx)
        assert ((idx >= 10) & (idx < 40)).all()
        np.testing.assert_array_equal(
            np.asarray(centers), pc[np.arange(2)[:, None], idx])

    def test_no_positive_fallback(self, rng):
        pc = rng.randn(1, 32, 6).astype(np.float32)
        score = np.zeros((1, 32), np.float32)
        centers, idx = geometry.select_score_centers(
            jnp.asarray(pc), jnp.asarray(score), 8, 0.5)
        assert np.asarray(idx).shape == (1, 8)  # falls back to all points

    def test_bucket_method_selects_positives(self, rng):
        """Serving center_select='bucket': one-pass stratified pick —
        positives only, gathered centers consistent, all-negative rows
        fall back to the full cloud (reference fallback semantics)."""
        pc = rng.randn(2, 96, 6).astype(np.float32)
        score = np.zeros((2, 96), np.float32)
        score[0, 20:70] = 0.9            # row 0 has positives
        centers, idx = geometry.select_score_centers(
            jnp.asarray(pc), jnp.asarray(score), 16, 0.5,
            method="bucket")
        idx = np.asarray(idx)
        assert ((idx[0] >= 20) & (idx[0] < 70)).all()
        assert (idx[1] >= 0).all() and (idx[1] < 96).all()  # fallback row
        np.testing.assert_array_equal(
            np.asarray(centers), pc[np.arange(2)[:, None], idx])


class TestGrouping:
    def test_groups_within_radius(self, rng):
        pc = rng.rand(2, 200, 6).astype(np.float32)
        centers = pc[:, :5]
        out = geometry.group_regions(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(centers),
            group_num=8, radius=0.3)
        assert np.asarray(out.valid).all()   # center itself is in radius
        pts = np.asarray(out.points)
        for b in range(2):
            for c in range(5):
                d = np.linalg.norm(pts[b, c, :, :3] - centers[b, c, :3],
                                   axis=-1)
                assert (d <= 0.3 + 1e-5).all()

    def test_chunked_matches_unchunked(self, rng):
        pc = rng.rand(1, 100, 6).astype(np.float32)
        centers = pc[:, :10]
        a = geometry.group_regions(jax.random.PRNGKey(0), jnp.asarray(pc),
                                   jnp.asarray(centers), 8, 0.3,
                                   center_chunk=3)
        b = geometry.group_regions(jax.random.PRNGKey(0), jnp.asarray(pc),
                                   jnp.asarray(centers), 8, 0.3,
                                   center_chunk=1024)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))


class TestClosingRegion:
    def test_known_box(self):
        gripper = GripperConfig()  # depth .06 width .08 height .01
        # grasp at origin, axis_y = +y, theta = 0 -> gripper frame = identity
        grasp = jnp.array([[[0, 0, 0, 0, 1, 0, 0, 0.5]]], jnp.float32)
        pts = np.array([
            [0.01, 0.0, 0.0],      # inside
            [0.02, 0.03, 0.004],   # inside (x<0.03, |y|<0.04, |z|<0.005)
            [-0.01, 0.0, 0.0],     # behind (x<0)
            [0.04, 0.0, 0.0],      # too deep (x>0.03)
            [0.01, 0.05, 0.0],     # too wide
            [0.01, 0.0, 0.006],    # too thick
        ] + [[0.015, 0.001 * i, 0.0] for i in range(10)], np.float32)
        pc = np.concatenate([pts, np.zeros_like(pts)], axis=1)[None]
        gidx = np.arange(len(pts), dtype=np.int32)[None, None]
        out = geometry.closing_region_crop(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(gidx),
            grasp, gripper, gripper_num=8, min_points=5)
        assert bool(out.valid[0, 0])      # 12 inside points > 5
        sel = set(np.asarray(out.index_in_all)[0, 0].tolist())
        assert sel <= ({0, 1} | set(range(6, 16)))  # only inside points

    def test_too_few_points_invalid(self):
        gripper = GripperConfig()
        grasp = jnp.array([[[0, 0, 0, 0, 1, 0, 0, 0.5]]], jnp.float32)
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [1, 1, 1], [2, 2, 2],
                        [3, 3, 3], [4, 4, 4], [5, 5, 5], [6, 6, 6]],
                       np.float32)
        pc = np.concatenate([pts, np.zeros_like(pts)], 1)[None]
        gidx = np.arange(8, dtype=np.int32)[None, None]
        out = geometry.closing_region_crop(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(gidx),
            grasp, gripper, gripper_num=4, min_points=5)
        assert not bool(out.valid[0, 0])  # only 2 inside points

    def test_rotated_grasp(self):
        # axis_y = +x is non-canonical for encode but fine for decode;
        # use y = [0,0,1]: x0 = [0,-0,0]? degenerate -> fallback.
        # Instead test theta = pi/2 rotation about y.
        gripper = GripperConfig()
        grasp = jnp.array([[[0, 0, 0, 0, 1, 0, np.pi / 2, 0.5]]], jnp.float32)
        # approach becomes -z after rotating [1,0,0] about +y by... check:
        # R1 rotates x0=[1,0,0] to [cos, 0, sin] = [0,0,1]
        pts = np.array([[0.0, 0.0, 0.02]] * 8, np.float32)  # along +z
        pc = np.concatenate([pts, np.zeros_like(pts)], 1)[None]
        gidx = np.arange(8, dtype=np.int32)[None, None]
        out = geometry.closing_region_crop(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(gidx),
            grasp, gripper, gripper_num=4, min_points=5)
        assert bool(out.valid[0, 0])
        # local x coordinate should be +0.02 (approach axis = world +z)
        np.testing.assert_allclose(
            np.asarray(out.points)[0, 0, :, 0], 0.02, atol=1e-5)


class TestGTMatching:
    def test_match_and_labels(self, rng):
        frames = random_rotations(rng, 4)
        trans = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]],
                         np.float32)
        gt_frames = np.concatenate([frames, trans[:, :, None]], axis=2)[None]
        gt_scores = rng.rand(1, 4, 3).astype(np.float32)
        gt_valid = np.array([[True, True, True, False]])
        centers = np.array([[[0.01, 0, 0],      # near gt0 (d2=1e-4 < .005)
                             [1.0, 1.05, 1.0],  # near gt1 (d2=2.5e-3)
                             [5.0, 5.0, 5.0],   # far from everything
                             [3.0, 3.0, 3.0]]], # exactly on INVALID gt3
                           np.float32)
        grasp_gt, matched = geometry.match_centers_to_gt(
            jnp.asarray(centers), jnp.asarray(gt_frames),
            jnp.asarray(gt_scores), jnp.asarray(gt_valid))
        matched = np.asarray(matched)[0]
        # center 3 sits on gt3 which is padding -> nearest valid is gt2 at
        # d2 = 0 distance? no: gt2 at (2,2,2), d2 = 3 > 0.005 -> unmatched
        np.testing.assert_array_equal(matched, [True, True, False, False])
        g = np.asarray(grasp_gt)[0]
        np.testing.assert_allclose(g[0, :3], trans[0], atol=1e-6)
        np.testing.assert_allclose(g[1, :3], trans[1], atol=1e-6)
        assert (g[2] == -1).all() and (g[3] == -1).all()
        # label scores carried through
        np.testing.assert_allclose(g[0, 7:], gt_scores[0, 0], atol=1e-6)

    def test_squared_threshold_quirk(self):
        """The 0.005 threshold applies to squared distance (reference
        parity): a center 6cm away still matches."""
        gt_frames = np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1, 1))
        gt_scores = np.ones((1, 1, 3), np.float32)
        gt_valid = np.ones((1, 1), bool)
        centers = np.array([[[0.06, 0, 0]]], np.float32)   # d2 = 3.6e-3
        _, matched = geometry.match_centers_to_gt(
            jnp.asarray(centers), jnp.asarray(gt_frames),
            jnp.asarray(gt_scores), jnp.asarray(gt_valid))
        assert bool(matched[0, 0])


class TestDenseCrop:
    def test_matches_group_based_crop_semantics(self, rng):
        """Dense (full-cloud) crop must select the same inside-point SET
        as the group-based crop when the wide region covers everything."""
        from regnet_for_3d_grasping_tpu.geometry import (
            closing_region_crop_dense)
        gripper = GripperConfig()
        pc = (rng.rand(1, 64, 6) * 0.04).astype(np.float32)
        grasp = jnp.asarray(
            np.array([[[0.02, 0.02, 0.02, 0, 1, 0, 0.3, 0.5]]], np.float32))
        gidx = np.arange(64, dtype=np.int32)[None, None]
        a = geometry.closing_region_crop(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(gidx),
            grasp, gripper, gripper_num=32, min_points=1)
        b = closing_region_crop_dense(
            jax.random.PRNGKey(0), jnp.asarray(pc), grasp, gripper,
            gripper_num=32, min_points=1)
        assert bool(a.valid[0, 0]) == bool(b.valid[0, 0])
        if bool(a.valid[0, 0]):
            sa = set(np.asarray(a.index_in_all)[0, 0].tolist())
            sb = set(np.asarray(b.index_in_all)[0, 0].tolist())
            assert sa == sb      # same inside-point membership

    @pytest.mark.parametrize("chunk", [3, 512])
    def test_chunking_consistent(self, rng, chunk):
        from regnet_for_3d_grasping_tpu.geometry import (
            closing_region_crop_dense)
        gripper = GripperConfig()
        pc = (rng.rand(1, 128, 6) * 0.05).astype(np.float32)
        grasps = np.tile(
            np.array([[0.02, 0.02, 0.02, 0, 1, 0, 0.0, 0.5]], np.float32),
            (7, 1))[None]
        out = closing_region_crop_dense(
            jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(grasps),
            gripper, gripper_num=16, min_points=1, proposal_chunk=chunk)
        v = np.asarray(out.valid)[0]
        assert (v == v[0]).all()     # identical proposals agree
