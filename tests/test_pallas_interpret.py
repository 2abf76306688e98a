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

    def test_grouped_matches_lax(self):
        """Fused grouped kernel == routing the G slices through the batch
        axis of the lax path, masked and unmasked (bit-identical)."""
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import (
            fps_pallas_grouped)
        rng = np.random.RandomState(7)
        Bg, Ng, G, S = 2, 1024, 4, 64
        L = Ng // G
        xyz = jnp.asarray(rng.rand(Bg, Ng, 3).astype(np.float32))
        offs = (np.arange(G, dtype=np.int32) * L)[None, :, None]
        for mask in (None, jnp.asarray(rng.rand(Bg, Ng) < 0.6)):
            mg = None if mask is None else mask.reshape(Bg * G, L)
            lax_idx = np.asarray(F.farthest_point_sample(
                xyz.reshape(Bg * G, L, 3), S // G, mg))
            ref = (lax_idx.reshape(Bg, G, -1) + offs).reshape(Bg, S)
            dist = F._dist_init(xyz.reshape(Bg * G, L, 3), mg)
            got = np.asarray(fps_pallas_grouped(
                xyz, dist.reshape(Bg, Ng), S, G, interpret=True))
            np.testing.assert_array_equal(got, ref)


class TestThreeNNInterpret:
    def test_matches_xla(self, cloud):
        from regnet_for_3d_grasping_tpu.ops.knn import three_nn
        from regnet_for_3d_grasping_tpu.ops.knn_pallas import (
            three_nn_pallas)
        xyz, centers = cloud
        ri, rd = three_nn(centers, xyz)
        for version in (1, 2):
            pi, pd = three_nn_pallas(centers, xyz, version=version,
                                     interpret=True)
            np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
            np.testing.assert_allclose(np.asarray(pd), np.asarray(rd),
                                       rtol=1e-5, atol=1e-6)


class TestBallQueryInterpret:
    def test_counts_and_membership(self, cloud):
        from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
            ball_query_pallas)
        xyz, centers = cloud
        radius, K = 0.25, 16
        for version in (1, 2):
            idx, cnt = ball_query_pallas(xyz, centers, radius, K,
                                         version=version, interpret=True)
            idx, cnt = np.asarray(idx), np.asarray(cnt)
            d2 = np.sum((np.asarray(centers)[:, :, None]
                         - np.asarray(xyz)[:, None]) ** 2, -1)
            inside = d2 <= radius ** 2
            np.testing.assert_array_equal(cnt,
                                          np.minimum(inside.sum(-1), K))
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


class TestGatherMaxInterpret:
    """Fused gather+max (ops/pooling.py) vs the XLA gather+max."""

    def _case(self, rng, B, N, C, S, K, dtype):
        import regnet_for_3d_grasping_tpu.ops.pooling as gm
        from regnet_for_3d_grasping_tpu.ops.sampling import (
            bucket_choice, bucket_stride, hash_uniform)
        feat = jnp.asarray(
            rng.randn(B, N, C).astype(np.float32)).astype(dtype)
        # bucket-structured indices with sparse masks (-> duplicate
        # fills) and a fully-degenerate row (-> all-zero indices)
        mask = jnp.asarray(rng.rand(B, S, N) < 0.008)
        mask = mask.at[0, 0].set(False)
        noise = hash_uniform(jax.random.PRNGKey(7), mask.shape)
        idx, any_valid, _ = bucket_choice(mask, K, score=noise)
        idx = jnp.where(any_valid[..., None], idx, 0)
        stride = bucket_stride(N, K)
        ref = gm._xla_pooled(feat, idx)
        got = gm.gather_max_pallas(feat, idx, stride, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        got2, win = gm.gather_max_pallas(feat, idx, stride,
                                         with_argmax=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref))
        # every winner row must actually hold the pooled value
        wv = jax.vmap(jax.vmap(
            lambda w, f: f[w, jnp.arange(C)], in_axes=(0, None)),
            in_axes=(0, 0))(win, feat)
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(ref))

    def test_f32_exact(self):
        rng = np.random.RandomState(11)
        self._case(rng, 1, 1600, 128, 96, 16, jnp.float32)

    def test_bf16_exact(self):
        rng = np.random.RandomState(12)
        self._case(rng, 1, 1600, 128, 96, 16, jnp.bfloat16)

    def test_crop_shape_unpadded_window(self):
        # stride already a 128-multiple (the Pallas-crop producer shape):
        # exercises the no-pad window path where fills could otherwise
        # alias a real row
        rng = np.random.RandomState(13)
        self._case(rng, 1, 1024, 128, 64, 8, jnp.float32)

    def test_batched(self):
        rng = np.random.RandomState(14)
        self._case(rng, 2, 800, 128, 72, 8, jnp.float32)

    def test_grad_matches_autodiff(self):
        import regnet_for_3d_grasping_tpu.ops.pooling as gm
        rng = np.random.RandomState(15)
        B, N, C, S, K, stride = 2, 800, 32, 40, 8, 100
        feat = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        off = rng.randint(0, stride, (B, S, K))
        idx = jnp.asarray(np.minimum(
            (np.arange(K) * stride)[None, None, :] + off, N - 1
        ).astype(np.int32))
        g1 = jax.grad(lambda f: jnp.sum(jnp.sin(
            gm.gather_max(f, idx, stride))))(feat)
        g2 = jax.grad(lambda f: jnp.sum(jnp.sin(
            gm._xla_pooled(f, idx))))(feat)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)
