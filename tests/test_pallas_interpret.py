"""Interpret-mode parity for every Pallas kernel, runnable on CPU.

tests/test_pallas_kernels.py compiles the Mosaic kernels and therefore
only runs with a TPU attached; this module exercises the same kernel
bodies through ``pallas_call(interpret=True)`` at tiny shapes so the CPU
suite catches semantic regressions in the kernel logic itself (it cannot
catch Mosaic *lowering* gaps — e.g. the uint32->f32 cast the TPU-gated
tests exist for — but it covers everything above the lowering layer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

B, N, M = 2, 1100, 130     # deliberately unaligned (exercise padding)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    centers = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    return xyz, centers


class TestFPSInterpret:
    def test_matches_lax(self, cloud):
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        xyz, _ = cloud
        dist = jnp.full((B, N), 1e10, jnp.float32)
        lax_idx = np.asarray(F.farthest_point_sample(xyz, 16))
        for version in (1, 2):
            p = np.asarray(fps_pallas(xyz, dist, 16, version=version,
                                      interpret=True))
            np.testing.assert_array_equal(p, lax_idx)

    def test_masked_matches_lax(self, cloud):
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        xyz, _ = cloud
        mask = np.zeros((B, N), bool)
        mask[:, 50:900] = True
        dist = jnp.where(jnp.asarray(mask), 1e10, -1.0)
        lax_idx = np.asarray(
            F.farthest_point_sample(xyz, 16, jnp.asarray(mask)))
        p = np.asarray(fps_pallas(xyz, dist, 16, interpret=True))
        np.testing.assert_array_equal(p, lax_idx)


class TestThreeNNInterpret:
    def test_matches_xla(self, cloud):
        from regnet_for_3d_grasping_tpu.ops.knn import three_nn
        from regnet_for_3d_grasping_tpu.ops.knn_pallas import (
            three_nn_pallas)
        xyz, centers = cloud
        ri, rd = three_nn(centers, xyz)
        pi, pd = three_nn_pallas(centers, xyz, interpret=True)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(pd), np.asarray(rd),
                                   rtol=1e-5, atol=1e-6)


class TestBallQueryInterpret:
    def test_counts_and_membership(self, cloud):
        from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
            ball_query_pallas)
        xyz, centers = cloud
        radius, K = 0.25, 16
        idx, cnt = ball_query_pallas(xyz, centers, radius, K,
                                     interpret=True)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        d2 = np.sum((np.asarray(centers)[:, :, None]
                     - np.asarray(xyz)[:, None]) ** 2, -1)
        inside = d2 <= radius ** 2
        np.testing.assert_array_equal(cnt, np.minimum(inside.sum(-1), K))
        rows = inside.any(-1)
        picked = np.take_along_axis(inside, idx, axis=-1)
        assert picked[rows].all()


class TestCropInterpret:
    def test_matches_xla_dense(self, cloud):
        from regnet_for_3d_grasping_tpu.geometry.codec import (
            grasps_to_frames)
        from regnet_for_3d_grasping_tpu.geometry.region import (
            closing_region_crop_dense)
        from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
            closing_region_crop_pallas)
        from regnet_for_3d_grasping_tpu.utils.config import infer_config
        xyz, centers = cloud
        g = infer_config().gripper
        grasp = jnp.concatenate([
            centers, jnp.tile(jnp.asarray([[0., 1., 0., 0., 0.]]),
                              (B, M, 1))], axis=-1)
        ref = closing_region_crop_dense(jax.random.PRNGKey(0), xyz, grasp,
                                        g, 16)
        frames, bases = grasps_to_frames(grasp)
        box = (0.0, g.depth / 2, g.width / 2, g.height / 2)
        idx, cnt = closing_region_crop_pallas(
            xyz, frames, bases, jnp.uint32(9), box, 16, interpret=True)
        np.testing.assert_array_equal(np.asarray(cnt > 5),
                                      np.asarray(ref.valid))
        # every picked index of a non-empty row is really inside the box
        local = np.einsum("bmij,bmni->bmnj", np.asarray(frames),
                          np.asarray(xyz)[:, None]
                          - np.asarray(bases)[:, :, None])
        inside = ((local[..., 0] > 0) & (local[..., 0] < g.depth / 2)
                  & (np.abs(local[..., 1]) < g.width / 2)
                  & (np.abs(local[..., 2]) < g.height / 2))
        rows = inside.any(-1)
        picked = np.take_along_axis(inside, np.asarray(idx), axis=-1)
        assert picked[rows].all()


class TestGroupInterpret:
    def test_matches_xla_group(self, cloud):
        from regnet_for_3d_grasping_tpu.geometry.region import (
            group_regions)
        from regnet_for_3d_grasping_tpu.ops.group_pallas import (
            group_regions_pallas)
        xyz, centers = cloud
        radius, K = 0.3, 16
        ref = group_regions(jax.random.PRNGKey(1), xyz, centers, K,
                            radius, with_points=False)
        idx, cnt = group_regions_pallas(xyz, centers, jnp.uint32(5),
                                        radius, K, interpret=True)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        np.testing.assert_array_equal(cnt > 0, np.asarray(ref.valid))
        d2 = np.sum((np.asarray(centers)[:, :, None]
                     - np.asarray(xyz)[:, None]) ** 2, -1)
        inside = d2 <= radius ** 2
        np.testing.assert_array_equal(cnt, inside.sum(-1))
        rows = inside.any(-1)
        picked = np.take_along_axis(inside, idx, axis=-1)
        assert picked[rows].all()
