"""Op-level numerical tests vs. pure-numpy reference implementations.

This is the `test_gather_knn` pattern from the reference
(functions/gather_knn.py:26-59) applied to every op, per SURVEY §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu import ops


def np_fps(xyz, num_samples, mask=None):
    """Straightforward numpy FPS, first-valid start."""
    n = xyz.shape[0]
    valid = np.ones(n, bool) if mask is None else mask.copy()
    if not valid.any():
        valid[:] = True
    dist = np.where(valid, 1e10, -1.0)
    farthest = int(np.argmax(valid))
    out = []
    for _ in range(num_samples):
        out.append(farthest)
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        upd = dist >= 0
        dist[upd] = np.minimum(dist[upd], d[upd])
        farthest = int(np.argmax(dist))
    return np.array(out)


class TestFPS:
    def test_matches_numpy(self, rng):
        xyz = rng.randn(2, 64, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))
        for b in range(2):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))

    def test_starts_at_zero_unmasked(self, rng):
        xyz = rng.randn(1, 32, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 4))
        assert got[0, 0] == 0

    def test_spread(self, rng):
        # FPS indices must be distinct and better-spread than the prefix
        xyz = rng.rand(1, 256, 3).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))[0]
        assert len(set(idx.tolist())) == 32
        sel = xyz[0, idx]
        d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
        d_fps = np.min(d + np.eye(32) * 1e9)
        pre = xyz[0, :32]
        dp = np.linalg.norm(pre[:, None] - pre[None, :], axis=-1)
        d_pre = np.min(dp + np.eye(32) * 1e9)
        assert d_fps > d_pre

    def test_masked_selects_only_valid(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        mask = np.zeros((1, 64), bool)
        mask[0, 10:30] = True
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 16, jnp.asarray(mask)))
        assert ((idx >= 10) & (idx < 30)).all()
        # 20 valid points, 16 requested -> all distinct
        assert len(set(idx[0].tolist())) == 16

    def test_masked_matches_numpy(self, rng):
        xyz = rng.randn(2, 48, 3).astype(np.float32)
        mask = rng.rand(2, 48) > 0.5
        got = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 8, jnp.asarray(mask)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], 8, mask[b]))

    def test_empty_mask_falls_back_to_all(self, rng):
        xyz = rng.randn(1, 32, 3).astype(np.float32)
        mask = np.zeros((1, 32), bool)
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 8, jnp.asarray(mask)))
        np.testing.assert_array_equal(idx[0], np_fps(xyz[0], 8))

    def test_fewer_valid_than_samples_repeats(self, rng):
        xyz = rng.randn(1, 32, 3).astype(np.float32)
        mask = np.zeros((1, 32), bool)
        mask[0, [3, 7]] = True
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 6, jnp.asarray(mask)))
        assert set(idx[0].tolist()) <= {3, 7}


def np_ball_query(xyz, centers, radius, k):
    """First-k-in-index-order semantics of ball_query_kernel.cu."""
    M = centers.shape[0]
    idx = np.zeros((M, k), np.int32)
    cnt = np.zeros(M, np.int32)
    for m in range(M):
        d2 = np.sum((xyz - centers[m]) ** 2, axis=-1)
        hits = np.nonzero(d2 < radius * radius)[0][:k]
        c = len(hits)
        cnt[m] = c
        if c > 0:
            idx[m, :c] = hits
            idx[m, c:] = hits[0]
    return idx, cnt


    def test_grouped_stratified(self, rng):
        """groups=G: per-slice exact FPS — indices stay in their slice,
        spread stays comparable to exact FPS (ops/fps.py groups)."""
        xyz = rng.randn(2, 128, 3).astype(np.float32)
        G, S = 4, 32
        got = np.asarray(ops.farthest_point_sample(
            jnp.asarray(xyz), S, groups=G))
        L, per = 128 // G, S // G
        for b in range(2):
            assert len(set(got[b])) == S
            for g in range(G):
                sl = got[b, g * per:(g + 1) * per]
                assert ((sl >= g * L) & (sl < (g + 1) * L)).all()
                # slice-local picks == exact FPS on the slice
                np.testing.assert_array_equal(
                    sl - g * L, np_fps(xyz[b, g * L:(g + 1) * L], per))

        def min_pairwise(pts):
            d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
            d[np.diag_indices(len(pts))] = np.inf
            return d.min()

        exact = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), S))
        for b in range(2):
            r = min_pairwise(xyz[b][got[b]]) / min_pairwise(xyz[b][exact[b]])
            assert r > 0.4, r      # stratified spread stays in the same
            # regime as exact FPS (quality gate proper runs on the
            # frozen benchmark suite)

    def test_grouped_masked(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        mask = np.zeros((1, 64), bool)
        mask[0, 5:60] = True
        got = np.asarray(ops.farthest_point_sample(
            jnp.asarray(xyz), 16, mask=jnp.asarray(mask), groups=4))
        assert mask[0][got[0]].all()


class TestBallQuery:
    @pytest.mark.parametrize("chunk", [7, 16, 4096])
    def test_exact_matches_numpy(self, rng, chunk):
        xyz = rng.rand(2, 100, 3).astype(np.float32)
        centers = xyz[:, :10]
        got_idx, got_cnt = ops.ball_query(
            jnp.asarray(xyz), jnp.asarray(centers), 0.25, 8, chunk=chunk,
            method="exact")
        for b in range(2):
            ref_idx, ref_cnt = np_ball_query(xyz[b], centers[b], 0.25, 8)
            np.testing.assert_array_equal(np.asarray(got_cnt[b]), ref_cnt)
            np.testing.assert_array_equal(np.asarray(got_idx[b]), ref_idx)

    @pytest.mark.parametrize("chunk", [3, 4096])
    def test_bucket_selects_in_radius(self, rng, chunk):
        xyz = rng.rand(2, 100, 3).astype(np.float32)
        centers = xyz[:, :10]
        idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                  0.25, 8, chunk=chunk, method="bucket")
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        for b in range(2):
            _, ref_cnt = np_ball_query(xyz[b], centers[b], 0.25, 8)
            np.testing.assert_array_equal(cnt[b], ref_cnt)
            for m in range(10):
                d = np.linalg.norm(xyz[b][idx[b, m]] - centers[b, m],
                                   axis=-1)
                assert (d < 0.25).all()

    def test_bucket_count_capped_and_distinct(self, rng):
        # many in-radius points: selection must return k distinct indices
        xyz = rng.rand(1, 512, 3).astype(np.float32) * 0.01
        centers = xyz[:, :1]
        idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                  0.5, 16, method="bucket")
        assert int(cnt[0, 0]) == 16            # capped at K
        assert len(set(np.asarray(idx)[0, 0].tolist())) == 16

    def test_centroid_always_within_own_ball(self, rng):
        xyz = rng.rand(1, 64, 3).astype(np.float32)
        centers = xyz[:, 5:6]
        idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                  1e-4, 4)
        assert int(cnt[0, 0]) >= 1
        assert (np.asarray(idx[0, 0]) == 5).all()


class TestGrouping:
    def test_gather_points(self, rng):
        pts = rng.randn(2, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, (2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    def test_group_points_and_grad(self, rng):
        pts = rng.randn(1, 16, 4).astype(np.float32)
        idx = rng.randint(0, 16, (1, 5, 3)).astype(np.int32)

        def f(p):
            return jnp.sum(ops.group_points(p, jnp.asarray(idx)) ** 2)

        got = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_array_equal(got[0], pts[0][idx[0]])
        # backward = scatter-add of 2*x at every gathered position
        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        expect = np.zeros_like(pts)
        for s in range(5):
            for k in range(3):
                j = idx[0, s, k]
                expect[0, j] += 2 * pts[0, j]
        np.testing.assert_allclose(g, expect, rtol=1e-5)


class TestKNN:
    @pytest.mark.parametrize("chunk", [8, 8192])
    def test_three_nn(self, rng, chunk):
        q = rng.randn(2, 33, 3).astype(np.float32)
        kpts = rng.randn(2, 17, 3).astype(np.float32)
        idx, d2 = ops.three_nn(jnp.asarray(q), jnp.asarray(kpts), chunk=chunk)
        for b in range(2):
            full = np.sum((q[b][:, None] - kpts[b][None]) ** 2, axis=-1)
            ref_idx = np.argsort(full, axis=1)[:, :3]
            np.testing.assert_allclose(
                np.sort(np.asarray(d2[b]), axis=1),
                np.sort(np.take_along_axis(full, ref_idx, 1), axis=1),
                rtol=1e-4, atol=1e-5)
            # same neighbour sets
            assert (np.sort(np.asarray(idx[b]), 1) == np.sort(ref_idx, 1)).all()

    def test_interpolate(self, rng):
        feat = rng.randn(1, 10, 6).astype(np.float32)
        idx = rng.randint(0, 10, (1, 4, 3)).astype(np.int32)
        w = rng.rand(1, 4, 3).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        got = np.asarray(ops.three_interpolate(
            jnp.asarray(feat), jnp.asarray(idx), jnp.asarray(w)))
        expect = np.einsum("qkc,qk->qc", feat[0][idx[0]], w[0])
        np.testing.assert_allclose(got[0], expect, rtol=1e-5)


class TestDistances:
    def test_pdist2(self, rng):
        a = rng.randn(5, 3).astype(np.float32)
        b = rng.randn(7, 3).astype(np.float32)
        got = np.asarray(ops.pdist2(jnp.asarray(a), jnp.asarray(b)))
        expect = np.sum((a[:, None] - b[None]) ** 2, axis=-1)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_bpdist2_batched(self, rng):
        a = rng.randn(2, 5, 3).astype(np.float32)
        b = rng.randn(2, 7, 3).astype(np.float32)
        got = np.asarray(ops.bpdist2(jnp.asarray(a), jnp.asarray(b)))
        for i in range(2):
            expect = np.sum((a[i][:, None] - b[i][None]) ** 2, axis=-1)
            np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-5)


class TestMaskedRandomChoice:
    def test_subset_without_replacement(self, rng):
        mask = np.zeros((3, 32), bool)
        mask[:, :20] = True
        idx, ok, cnt = ops.masked_random_choice(
            jax.random.PRNGKey(0), jnp.asarray(mask), 8)
        idx = np.asarray(idx)
        assert np.asarray(ok).all()
        assert (np.asarray(cnt) == 20).all()
        for r in range(3):
            assert (idx[r] < 20).all()
            assert len(set(idx[r].tolist())) == 8

    def test_wraps_when_short(self):
        mask = np.zeros((1, 16), bool)
        mask[0, [2, 9, 11]] = True
        idx, ok, cnt = ops.masked_random_choice(
            jax.random.PRNGKey(1), jnp.asarray(mask), 8)
        idx = np.asarray(idx)[0]
        assert set(idx.tolist()) == {2, 9, 11}
        assert int(cnt[0]) == 3

    def test_empty_row_flagged(self):
        mask = np.zeros((1, 16), bool)
        idx, ok, cnt = ops.masked_random_choice(
            jax.random.PRNGKey(2), jnp.asarray(mask), 4)
        assert not bool(ok[0])
        assert int(cnt[0]) == 0

    def test_uniformity(self):
        # each valid element should appear with roughly equal frequency
        mask = jnp.ones((1, 10), bool)
        counts = np.zeros(10)
        for i in range(200):
            idx, _, _ = ops.masked_random_choice(
                jax.random.PRNGKey(i), mask, 3)
            for j in np.asarray(idx)[0]:
                counts[j] += 1
        freq = counts / counts.sum()
        assert freq.max() < 0.2 and freq.min() > 0.05


class TestBucketChoice:
    def test_selects_only_valid(self, rng):
        mask = rng.rand(3, 64) > 0.5
        idx, ok, cnt = ops.bucket_choice(jnp.asarray(mask), 8)
        idx = np.asarray(idx)
        assert np.asarray(ok).all()
        for r in range(3):
            assert mask[r][idx[r]].all()
        np.testing.assert_array_equal(np.asarray(cnt), mask.sum(-1))

    def test_default_score_prefers_small_index(self):
        mask = np.ones((1, 16), bool)
        idx, _, _ = ops.bucket_choice(jnp.asarray(mask), 4)
        # 4 buckets of 4 -> first index of each bucket
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 4, 8, 12])

    def test_empty_buckets_pad_with_first_valid(self):
        mask = np.zeros((1, 16), bool)
        mask[0, 9] = True      # only bucket 2 valid
        idx, ok, cnt = ops.bucket_choice(jnp.asarray(mask), 4)
        np.testing.assert_array_equal(np.asarray(idx)[0], [9, 9, 9, 9])
        assert bool(ok[0]) and int(cnt[0]) == 1

    def test_all_invalid_flagged(self):
        mask = np.zeros((2, 16), bool)
        idx, ok, cnt = ops.bucket_choice(jnp.asarray(mask), 4)
        assert not np.asarray(ok).any()
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 16).all()

    def test_random_score_uniformish(self):
        # with uniform noise scores every valid element is reachable
        mask = jnp.ones((1, 12), bool)
        counts = np.zeros(12)
        for i in range(300):
            noise = jax.random.uniform(jax.random.PRNGKey(i), (1, 12))
            idx, _, _ = ops.bucket_choice(mask, 3, score=noise)
            for j in np.asarray(idx)[0]:
                counts[j] += 1
        assert (counts > 0).all()

    def test_non_divisible_padding(self, rng):
        mask = rng.rand(2, 19) > 0.3
        idx, ok, cnt = ops.bucket_choice(jnp.asarray(mask), 4)
        idx = np.asarray(idx)
        assert (idx < 19).all()
        for r in range(2):
            if np.asarray(ok)[r]:
                assert mask[r][idx[r]].all()


class TestHashUniform:
    def test_range_and_spread(self):
        from regnet_for_3d_grasping_tpu.ops.sampling import hash_uniform
        u = np.asarray(hash_uniform(jax.random.PRNGKey(0), (100, 257)))
        assert (u >= 0).all() and (u < 1).all()
        # roughly uniform: mean ~0.5, no more than 2% exact collisions
        assert abs(u.mean() - 0.5) < 0.02
        assert len(np.unique(u)) > u.size * 0.98

    def test_key_changes_stream(self):
        from regnet_for_3d_grasping_tpu.ops.sampling import hash_uniform
        a = np.asarray(hash_uniform(jax.random.PRNGKey(1), (64,)))
        b = np.asarray(hash_uniform(jax.random.PRNGKey(2), (64,)))
        assert not np.allclose(a, b)
