"""Pallas kernel parity vs the lax reference paths.

The regular suite runs on the CPU mesh where the auto-dispatch picks the
lax implementations; these tests exercise the Mosaic kernels directly and
therefore only run when a TPU backend is attached (they are routinely
driven on the chip via tools/ and bench.py as well).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU backend")


@pytest.fixture(scope="module")
def clouds(rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    return (jnp.asarray(rng.rand(2, 25600, 3).astype(np.float32)),
            jnp.asarray(rng.rand(2, 5120, 3).astype(np.float32)))


class TestFPSPallas:
    def test_matches_lax(self, clouds):
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        xyz, _ = clouds
        di = jnp.full(xyz.shape[:2], 1e10, jnp.float32)
        p = np.asarray(fps_pallas(xyz, di, 512))
        orig = F._use_pallas
        F._use_pallas = lambda *a: False
        try:
            l = np.asarray(F.farthest_point_sample(xyz, 512))
        finally:
            F._use_pallas = orig
        np.testing.assert_array_equal(p, l)

    def test_masked_matches_lax(self, clouds):
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        xyz, _ = clouds
        mask = np.zeros(xyz.shape[:2], bool)
        mask[:, 100:5000] = True
        di = jnp.where(jnp.asarray(mask), 1e10, -1.0)
        p = np.asarray(fps_pallas(xyz, di, 256))
        orig = F._use_pallas
        F._use_pallas = lambda *a: False
        try:
            l = np.asarray(F.farthest_point_sample(xyz, 256,
                                                   jnp.asarray(mask)))
        finally:
            F._use_pallas = orig
        np.testing.assert_array_equal(p, l)

    def test_grouped_matches_lax(self, clouds):
        """Fused grouped kernel (all G slices advancing in one sequential
        step) must be bit-identical to routing the slices through the
        batch axis of the lax path — this is what the model's
        fps_groups>1 config dispatches to on chip."""
        import regnet_for_3d_grasping_tpu.ops.fps as F
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import (
            fps_pallas_grouped)
        xyz, _ = clouds
        Bg, Ng = xyz.shape[:2]
        G, S = 8, 512
        L = Ng // G
        mask = np.zeros((Bg, Ng), bool)
        mask[:, 100:20000] = True
        offs = (np.arange(G, dtype=np.int32) * L)[None, :, None]
        orig = F._use_pallas
        F._use_pallas = lambda *a: False
        try:
            for m in (None, jnp.asarray(mask)):
                mg = None if m is None else m.reshape(Bg * G, L)
                lax_idx = np.asarray(F.farthest_point_sample(
                    xyz.reshape(Bg * G, L, 3), S // G, mg))
                ref = (lax_idx.reshape(Bg, G, -1) + offs).reshape(Bg, S)
                dist = F._dist_init(xyz.reshape(Bg * G, L, 3), mg)
                got = np.asarray(fps_pallas_grouped(
                    xyz, dist.reshape(Bg, Ng), S, G))
                np.testing.assert_array_equal(got, ref)
        finally:
            F._use_pallas = orig

    def test_v2_matches_v1(self, clouds):
        """The aligned-tile centroid extraction (v2) must be bit-identical
        to the masked-reduction kernel, unmasked and masked."""
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        xyz, _ = clouds
        di = jnp.full(xyz.shape[:2], 1e10, jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(fps_pallas(xyz, di, 512, 1)),
            np.asarray(fps_pallas(xyz, di, 512, 2)))
        mask = np.zeros(xyz.shape[:2], bool)
        mask[:, 1000:9000] = True
        dm = jnp.where(jnp.asarray(mask), 1e10, -1.0)
        np.testing.assert_array_equal(
            np.asarray(fps_pallas(xyz, dm, 256, 1)),
            np.asarray(fps_pallas(xyz, dm, 256, 2)))


class TestThreeNNPallas:
    def test_matches_lax(self, clouds):
        from regnet_for_3d_grasping_tpu.ops.knn import three_nn
        from regnet_for_3d_grasping_tpu.ops.knn_pallas import (
            three_nn_pallas)
        q, k = clouds
        pi, pd = map(np.asarray, three_nn_pallas(q, k))
        # force the lax path by staying under the dispatch threshold: call
        # the chunked implementation on slices and compare per-slice
        ri, rd = map(np.asarray, three_nn(q[:, :4096], k))
        np.testing.assert_allclose(np.sort(pd[:, :4096], -1),
                                   np.sort(rd, -1), rtol=1e-4, atol=1e-6)
        # ties at exactly-equal distances may order differently; compare
        # the neighbour sets
        frac = (np.sort(pi[:, :4096], -1) == np.sort(ri, -1)).mean()
        assert frac > 0.999

    def test_small_exact(self):
        from regnet_for_3d_grasping_tpu.ops.knn import three_nn
        from regnet_for_3d_grasping_tpu.ops.knn_pallas import (
            three_nn_pallas)
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.rand(2, 300, 3).astype(np.float32))
        k = jnp.asarray(rng.rand(2, 200, 3).astype(np.float32))
        pi, pd = map(np.asarray, three_nn_pallas(q, k))
        ri, rd = map(np.asarray, three_nn(q, k))
        np.testing.assert_array_equal(np.sort(pi, -1), np.sort(ri, -1))
        np.testing.assert_allclose(pd, rd, atol=1e-6)


class TestBallQueryPallas:
    def test_semantics(self, clouds):
        from regnet_for_3d_grasping_tpu.ops.ball_query import ball_query
        from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
            ball_query_pallas)
        xyz, _ = clouds
        xyz = xyz * 0.5
        centers = xyz[:, :512]
        pi, pc = map(np.asarray, ball_query_pallas(xyz, centers, 0.02, 64))
        ri, rc = map(np.asarray, ball_query(xyz, centers, 0.02, 64))
        # counts may differ by f32 boundary rounding (kernel is exact,
        # bpdist2 uses the expansion form) — allow +-2
        assert (np.abs(pc.astype(int) - rc.astype(int)) <= 2).all()
        # every selected point is in-radius where hits exist
        x0, c0 = np.asarray(xyz[0]), np.asarray(centers[0])
        for m in range(0, 512, 37):
            if pc[0, m] > 0:
                d = np.linalg.norm(x0[pi[0, m]] - c0[m], axis=-1)
                assert (d < 0.02 + 1e-6).all()


class TestCropPallas:
    def test_counts_match_xla(self):
        """Fused crop kernel: exact inside-counts + valid mask parity with
        the XLA dense crop; selected indices must be inside the box."""
        from regnet_for_3d_grasping_tpu.geometry.codec import (
            grasps_to_frames)
        from regnet_for_3d_grasping_tpu.geometry.region import (
            closing_region_crop_dense)
        from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
            closing_region_crop_pallas)
        from regnet_for_3d_grasping_tpu.utils.config import GripperConfig

        g = GripperConfig()
        rng = np.random.RandomState(3)
        B, N, M, K = 1, 25600, 512, 64
        xyz = rng.rand(B, N, 3).astype(np.float32) * 0.3
        xyz[..., 2] += 0.75
        pc = jnp.asarray(np.concatenate(
            [xyz, rng.rand(B, N, 3).astype(np.float32)], -1))
        centers = xyz[:, rng.choice(N, M)]
        y = rng.randn(B, M, 3).astype(np.float32)
        y /= np.linalg.norm(y, axis=-1, keepdims=True)
        grasp = jnp.asarray(np.concatenate(
            [centers, y, rng.randn(B, M, 1).astype(np.float32),
             np.zeros((B, M, 1), np.float32)], -1))

        ref = closing_region_crop_dense(jax.random.PRNGKey(0), pc, grasp,
                                        g, K, 5)
        frames, ctr = grasps_to_frames(grasp)
        idx, cnt = closing_region_crop_pallas(
            pc[..., :3], frames, ctr, jnp.uint32(7),
            (0.0, g.depth / 2, g.width / 2, g.height / 2), K)
        cnt = np.asarray(cnt)
        np.testing.assert_array_equal(cnt > 5, np.asarray(ref.valid))

        # numpy cross-check of counts + membership on a subsample
        fr, ce, x = map(np.asarray, (frames, ctr, pc[..., :3]))
        idx = np.asarray(idx)
        for m in range(0, M, 31):
            local = (x[0] - ce[0, m]) @ fr[0, m]
            ins = ((local[:, 0] > 0) & (local[:, 0] < g.depth / 2)
                   & (np.abs(local[:, 1]) < g.width / 2)
                   & (np.abs(local[:, 2]) < g.height / 2))
            assert ins.sum() == cnt[0, m]
            if ins.sum():
                assert ins[idx[0, m]].all()


class TestGroupPallas:
    def test_counts_and_membership(self):
        from regnet_for_3d_grasping_tpu.ops.distances import bpdist2
        from regnet_for_3d_grasping_tpu.ops.group_pallas import (
            group_regions_pallas)
        rng = np.random.RandomState(5)
        B, N, M, K, r = 1, 25600, 512, 256, 0.008
        xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4)
        centers = xyz[:, :M]
        idx, cnt = map(np.asarray,
                       group_regions_pallas(xyz, centers, jnp.uint32(5),
                                            r, K))
        ref_cnt = (np.asarray(bpdist2(centers, xyz)) <= r * r).sum(-1)
        # exact diff-square vs expansion-form can differ by 1 ulp at the
        # radius boundary
        assert (np.abs(cnt - ref_cnt) <= 2).all()
        x0, c0 = np.asarray(xyz[0]), np.asarray(centers[0])
        for m in range(0, M, 29):
            if cnt[0, m] > 0:
                d = np.linalg.norm(x0[idx[0, m]] - c0[m], axis=-1)
                assert (d <= r + 1e-6).all()


class TestGatherMaxPallas:
    """Mosaic lowering + bit-exactness of the fused gather+max pooling
    at the production shapes (interpret-mode semantics are covered on
    CPU in tests/test_pallas_interpret.py)."""

    def _idx(self, rng, S, N, K):
        import regnet_for_3d_grasping_tpu.ops.pooling as gm  # noqa: F401
        from regnet_for_3d_grasping_tpu.ops.sampling import (
            bucket_choice, bucket_stride, hash_uniform)
        mask = jnp.asarray(rng.rand(1, S, N) < 0.01)
        noise = hash_uniform(jax.random.PRNGKey(5), mask.shape)
        idx, av, _ = bucket_choice(mask, K, score=noise)
        return jnp.where(av[..., None], idx, 0), bucket_stride(N, K)

    def test_region_and_refine_shapes_exact(self):
        import regnet_for_3d_grasping_tpu.ops.pooling as gm
        rng = np.random.RandomState(0)
        N, C = 25600, 256
        feat = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
        for S, K in ((4000, 256), (4000, 64)):
            idx, stride = self._idx(rng, S, N, K)
            ref = gm._xla_pooled(feat, idx)
            got = gm.gather_max_pallas(feat, idx, stride)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(ref))
            got2, win = gm.gather_max_pallas(feat, idx, stride,
                                             with_argmax=True)
            np.testing.assert_array_equal(np.asarray(got2),
                                          np.asarray(ref))
            fb = feat.astype(jnp.bfloat16)
            np.testing.assert_array_equal(
                np.asarray(gm.gather_max_pallas(fb, idx, stride)),
                np.asarray(gm._xla_pooled(fb, idx)))

    def test_winner_rows_hold_pooled_values(self):
        import regnet_for_3d_grasping_tpu.ops.pooling as gm
        rng = np.random.RandomState(1)
        N, C, S, K = 25600, 256, 512, 256
        feat = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
        idx, stride = self._idx(rng, S, N, K)
        pooled, win = gm.gather_max_pallas(feat, idx, stride,
                                           with_argmax=True)
        f = np.asarray(feat[0])
        w = np.asarray(win[0])
        np.testing.assert_array_equal(
            f[w, np.arange(C)[None, :]], np.asarray(pooled[0]))


class TestSlabKernels:
    """Mosaic lowering coverage for ops/slab.py (semantics covered on CPU
    in tests/test_slab.py; this compiles the real kernels on the chip)."""

    def _scene(self):
        from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
        from regnet_for_3d_grasping_tpu.ops import slab
        scene = make_synthetic_scene(3, num_view=25600)
        pc = jnp.asarray(scene["view_cloud"].astype(np.float32)[None])
        _, sc = slab.sort_cloud(jax.random.PRNGKey(0), pc, 0.04)
        rng = np.random.RandomState(5)
        c = np.asarray(pc[0])[rng.choice(25600, 512, False)]
        centers = jnp.asarray(c[np.argsort(c[:, 0])][None])
        return slab, sc, centers, rng

    def test_group_slab_counts_exact(self):
        slab, sc, centers, rng = self._scene()
        idx, cnt, sel, off = slab.group_slab(sc, centers, jnp.uint32(7),
                                             0.008, 256, 0.04)
        d2 = jnp.sum((centers[0][:, None] - sc.xyz[0][None]) ** 2, -1)
        ref = jnp.sum(d2 <= 0.008 ** 2, -1)
        np.testing.assert_array_equal(np.asarray(cnt[0]), np.asarray(ref))
        # winners in radius on selected rows
        wd = np.take_along_axis(np.asarray(d2), np.asarray(idx[0]), -1)
        s = np.asarray(sel[0])
        assert ((wd <= 0.008 ** 2 + 1e-9) | ~s[:, None]).all()

    def test_crop_slab_counts_match_full_kernel(self):
        from regnet_for_3d_grasping_tpu.geometry.codec import (
            grasps_to_frames)
        from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
            closing_region_crop_pallas)
        slab, sc, centers, rng = self._scene()
        M = centers.shape[1]
        g = np.zeros((1, M, 8), np.float32)
        g[0, :, :3] = np.asarray(centers[0])
        ax = rng.randn(M, 3).astype(np.float32)
        ax /= np.linalg.norm(ax, axis=1, keepdims=True)
        g[0, :, 3:6] = ax
        g[0, :, 6] = rng.uniform(-np.pi, np.pi, M)
        frame, center = grasps_to_frames(jnp.asarray(g))
        box = (0.0, 0.03, 0.04, 0.005)
        ci, ccnt, csel, coff = slab.crop_slab(sc, frame, center,
                                              jnp.uint32(9), box, 64, 0.04)
        fi, fcnt = closing_region_crop_pallas(sc.xyz, frame, center,
                                              jnp.uint32(9), box, 64)
        np.testing.assert_array_equal(np.asarray(ccnt), np.asarray(fcnt))

    def test_ball_query_slab_counts_exact(self):
        slab, sc, centers, rng = self._scene()
        idx, cnt = slab.ball_query_slab(sc, centers, jnp.uint32(11),
                                        0.02, 64, 0.04)
        d2 = jnp.sum((centers[0][:, None] - sc.xyz[0][None]) ** 2, -1)
        ref = jnp.minimum(jnp.sum(d2 <= 0.02 ** 2, -1), 64)
        np.testing.assert_array_equal(np.asarray(cnt[0]), np.asarray(ref))

    def test_three_nn_slab_exact_when_proven(self):
        slab, sc, centers, rng = self._scene()
        from regnet_for_3d_grasping_tpu.ops import three_nn
        keys = np.asarray(sc.xyz[0])[rng.choice(25600, 5120, False)]
        keys = jnp.asarray(keys[np.argsort(keys[:, 0])][None])
        qi, qd, proven = slab.three_nn_slab(sc.xyz, keys, bound=0.045)
        assert bool(np.asarray(proven)[0])
        ri, rd = three_nn(sc.xyz, keys, 3)
        np.testing.assert_array_equal(np.sort(np.asarray(qi[0]), axis=1),
                                      np.sort(np.asarray(ri[0]), axis=1))
        np.testing.assert_allclose(np.asarray(qd[0]), np.asarray(rd[0]),
                                   atol=1e-6)

    def test_gather_max_slab_exact(self):
        from regnet_for_3d_grasping_tpu.ops.grouping import group_points
        slab, sc, centers, rng = self._scene()
        idx, cnt, sel, off = slab.group_slab(sc, centers, jnp.uint32(7),
                                             0.008, 256, 0.04)
        for dt in (jnp.float32, jnp.bfloat16):
            feat = jnp.asarray(
                rng.randn(1, 25600, 256).astype(np.float32)).astype(dt)
            pooled = slab.gather_max_slab(feat, idx, off, slab.GROUP_WIN,
                                          slab.GROUP_SPW)
            ref = jnp.max(group_points(feat, idx), axis=-2)
            s = np.asarray(sel[0])
            np.testing.assert_array_equal(np.asarray(pooled[0])[s],
                                          np.asarray(ref[0])[s])
