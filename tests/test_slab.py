"""Sorted-slab kernels (ops/slab.py): interpret-mode semantics on CPU.

Covers the exactness contract (counts/membership identical to full
scans), the window-structure contract the fused pooling consumes, the
slab pooling itself, its VJP, and the end-to-end slab path through the
model.  Mosaic lowering is covered by tests/test_pallas_kernels.py's
TPU-gated twins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.ops import slab
from regnet_for_3d_grasping_tpu.ops.grouping import group_points

CELL = 0.04


def _cloud(B=2, N=9216, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.35, 0.35, (B, N, 3)).astype(np.float32)
    pts[..., 2] *= 0.1
    return pts


def _sorted_centers(pts, M, rng):
    out = []
    for b in range(pts.shape[0]):
        c = pts[b][rng.choice(pts.shape[1], M, False)]
        out.append(c[np.argsort(c[:, 0])])
    return np.stack(out)


class TestSortCloud:
    def test_cell_order_and_permutation(self):
        pts = _cloud()
        _, sc = slab.sort_cloud(jax.random.PRNGKey(0), jnp.asarray(pts), CELL)
        cr = np.asarray(sc.cell_row)
        assert (np.diff(cr, axis=-1) >= 0).all()
        for b in range(pts.shape[0]):
            # a permutation of the original rows
            np.testing.assert_array_equal(
                np.sort(np.asarray(sc.order)[b]), np.arange(pts.shape[1]))
            np.testing.assert_allclose(
                np.asarray(sc.xyz)[b], pts[b][np.asarray(sc.order)[b]])
            # cell ids consistent with coordinates
            np.testing.assert_array_equal(
                cr[b], np.floor(np.asarray(sc.xyz)[b, :, 0] / CELL))

    def test_random_within_cell(self):
        # within one cell the order must not be x-sorted (the diversity
        # property group selection relies on)
        pts = _cloud(B=1)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(1), jnp.asarray(pts), CELL)
        cr = np.asarray(sc.cell_row)[0]
        xs = np.asarray(sc.xyz)[0, :, 0]
        cell_id = cr[len(cr) // 2]
        seg = xs[cr == cell_id]
        assert len(seg) > 20
        assert not (np.diff(seg) >= 0).all()


class TestGroupSlab:
    @pytest.fixture(scope="class")
    def data(self):
        pts = _cloud()
        rng = np.random.RandomState(7)
        centers = _sorted_centers(pts, 256, rng)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(2), jnp.asarray(pts), CELL)
        radius, K = 0.03, 256
        idx, cnt, sel, off = slab.group_slab(
            sc, jnp.asarray(centers), jnp.uint32(7), radius, K, CELL,
            interpret=True)
        return pts, centers, sc, radius, K, tuple(
            np.asarray(a) for a in (idx, cnt, sel, off))

    def test_counts_exact(self, data):
        pts, centers, sc, radius, K, arrs = data
        idx, cnt, sel, off = arrs
        d2 = ((centers[:, :, None] - np.asarray(sc.xyz)[:, None]) ** 2
              ).sum(-1)
        np.testing.assert_array_equal(cnt, (d2 <= radius ** 2).sum(-1))
        np.testing.assert_array_equal(sel, cnt > 0)

    def test_winners_in_radius_and_windows(self, data):
        pts, centers, sc, radius, K, arrs = data
        idx, cnt, sel, off = arrs
        d2 = ((centers[:, :, None] - np.asarray(sc.xyz)[:, None]) ** 2
              ).sum(-1)
        win_d2 = np.take_along_axis(d2, idx, axis=-1)
        assert ((win_d2 <= radius ** 2 + 1e-9) | ~sel[..., None]).all()
        # window containment or duplicate-fill: slot j's own window is
        # [off*2048 + (j//4)*128, +128); a slot outside it must hold a
        # value that some in-window slot also holds
        B, M = cnt.shape
        for b in range(B):
            for m in range(0, M, 37):
                if not sel[b, m]:
                    continue
                base = off[b, m // 128] * 2048
                own = set()
                for j in range(K):
                    lo = base + (j // 4) * 128
                    if lo <= idx[b, m, j] < lo + 128:
                        own.add(int(idx[b, m, j]))
                for j in range(K):
                    lo = base + (j // 4) * 128
                    v = int(idx[b, m, j])
                    assert (lo <= v < lo + 128) or v in own

    def test_bounded_grid_bit_identical(self):
        """The bounded scan grid (step k -> block start+k) must match the
        full grid bit-for-bit when every tile's span fits, and the
        lax.cond must fall back to the full grid (still exact) when a
        wide tile blows the cap."""
        pts = _cloud(B=1, N=18432, seed=9)      # nblk=9 > default cap 6
        rng = np.random.RandomState(17)
        centers = _sorted_centers(pts, 384, rng)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(4), jnp.asarray(pts),
                                CELL)
        args = (sc, jnp.asarray(centers), jnp.uint32(5), 0.03, 256, CELL)
        bounded = slab.group_slab(*args, grid_span=6, interpret=True)
        full = slab.group_slab(*args, grid_span=99, interpret=True)
        for a, b in zip(bounded, full):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # one tile spanning the whole table forces span > cap: the cond
        # must take the full grid and counts stay exact
        wide = centers.copy()
        wide[0, :128] = np.linspace(-0.34, 0.34, 128)[:, None] * [1, 0, 0]
        idx, cnt, sel, off = slab.group_slab(
            sc, jnp.asarray(wide), jnp.uint32(5), 0.03, 256, CELL,
            grid_span=2, interpret=True)
        d2 = ((wide[:, :, None] - np.asarray(sc.xyz)[:, None]) ** 2
              ).sum(-1)
        np.testing.assert_array_equal(np.asarray(cnt),
                                      (d2 <= 0.03 ** 2).sum(-1))

    def test_pad_tile_counts_exact(self):
        """M not a multiple of 128 puts pad queries (x=1e10) into the
        last tile; its scan bounds must ignore them so the REAL queries
        in that tile still get exact counts."""
        pts = _cloud(B=1, N=18432, seed=10)
        rng = np.random.RandomState(19)
        centers = _sorted_centers(pts, 200, rng)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(6), jnp.asarray(pts),
                                CELL)
        idx, cnt, sel, off = slab.group_slab(
            sc, jnp.asarray(centers), jnp.uint32(3), 0.03, 256, CELL,
            interpret=True)
        d2 = ((centers[:, :, None] - np.asarray(sc.xyz)[:, None]) ** 2
              ).sum(-1)
        np.testing.assert_array_equal(np.asarray(cnt),
                                      (d2 <= 0.03 ** 2).sum(-1))

    def test_empty_rows(self):
        pts = _cloud(B=1)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(3), jnp.asarray(pts), CELL)
        far = jnp.asarray(np.full((1, 128, 3), 5.0, np.float32))
        idx, cnt, sel, off = slab.group_slab(
            sc, far, jnp.uint32(1), 0.03, 256, CELL, interpret=True)
        assert int(jnp.sum(cnt)) == 0
        assert not bool(jnp.any(sel))
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestCropSlab:
    @pytest.fixture(scope="class")
    def data(self):
        pts = _cloud(B=1, N=18432, seed=1)
        rng = np.random.RandomState(11)
        centers = _sorted_centers(pts, 256, rng)
        frames = np.stack([np.stack(
            [np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
             for _ in range(256)])])
        _, sc = slab.sort_cloud(jax.random.PRNGKey(5), jnp.asarray(pts), CELL)
        box = (0.0, 0.03, 0.04, 0.005)
        idx, cnt, sel, off = slab.crop_slab(
            sc, jnp.asarray(frames), jnp.asarray(centers), jnp.uint32(9),
            box, 64, CELL, interpret=True)
        return pts, centers, frames, sc, box, tuple(
            np.asarray(a) for a in (idx, cnt, sel, off))

    def test_counts_and_membership(self, data):
        pts, centers, frames, sc, box, arrs = data
        idx, cnt, sel, off = arrs
        rel = np.asarray(sc.xyz)[:, None] - centers[:, :, None]
        loc = np.einsum("bmij,bmni->bmnj", frames, rel)
        inside = ((loc[..., 0] > box[0]) & (loc[..., 0] < box[1])
                  & (np.abs(loc[..., 1]) < box[2])
                  & (np.abs(loc[..., 2]) < box[3]))
        np.testing.assert_array_equal(cnt, inside.sum(-1))
        np.testing.assert_array_equal(sel, cnt > 0)
        win_in = np.take_along_axis(inside, idx, axis=-1)
        assert (win_in | ~sel[..., None]).all()


class TestGatherMaxSlab:
    def _setup(self, dtype):
        pts = _cloud()
        rng = np.random.RandomState(13)
        centers = _sorted_centers(pts, 256, rng)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(2), jnp.asarray(pts), CELL)
        idx, cnt, sel, off = slab.group_slab(
            sc, jnp.asarray(centers), jnp.uint32(7), 0.03, 256, CELL,
            interpret=True)
        feat = jnp.asarray(
            rng.randn(pts.shape[0], pts.shape[1], 64).astype(np.float32)
        ).astype(dtype)
        return feat, idx, sel, off

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_gather_reference(self, dtype):
        feat, idx, sel, off = self._setup(dtype)
        pooled = slab.gather_max_slab(feat, idx, off, slab.GROUP_WIN,
                                      slab.GROUP_SPW, interpret=True)
        ref = jnp.max(group_points(feat, idx), axis=-2)
        m = np.asarray(sel)
        np.testing.assert_array_equal(np.asarray(pooled)[m],
                                      np.asarray(ref)[m])

    def test_grad_matches_autodiff(self):
        feat, idx, sel, off = self._setup(jnp.float32)
        g = jax.grad(lambda f: slab.gather_max_slab_vjp(
            f, idx, off, slab.GROUP_WIN, slab.GROUP_SPW, True).sum())(feat)
        g_ref = jax.grad(lambda f: jnp.sum(
            jnp.max(group_points(f, idx), axis=-2)))(feat)
        # tie routing may differ on duplicate rows; per-row totals agree
        np.testing.assert_allclose(np.asarray(g).sum(1),
                                   np.asarray(g_ref).sum(1), atol=1e-4)

    def test_bf16_argmax_path(self):
        """bf16 + with_argmax — the training-forward combination.  The
        kernel's running max/compare runs in f32 in-register (Mosaic has
        no bf16 cmpf on v5e) and downcasts only on store; pooled values
        and winner routing must match the plain-gather reference."""
        feat, idx, sel, off = self._setup(jnp.bfloat16)
        pooled, winner = slab.gather_max_slab(
            feat, idx, off, slab.GROUP_WIN, slab.GROUP_SPW,
            with_argmax=True, interpret=True)
        ref = jnp.max(group_points(feat, idx), axis=-2)
        m = np.asarray(sel)
        np.testing.assert_array_equal(np.asarray(pooled)[m],
                                      np.asarray(ref)[m])
        # every winner index must point at a row holding the max value
        w = np.asarray(winner)                      # [B, S, C]
        fv = np.asarray(feat)                       # [B, N, C]
        b_ix = np.arange(w.shape[0])[:, None, None]
        c_ix = np.arange(w.shape[2])[None, None, :]
        routed = fv[b_ix, w, c_ix]
        np.testing.assert_array_equal(routed[m], np.asarray(ref)[m])
        # bf16 grads flow through the custom VJP without dtype errors
        g = jax.grad(lambda f: slab.gather_max_slab_vjp(
            f, idx, off, slab.GROUP_WIN, slab.GROUP_SPW, True)
            .astype(jnp.float32).sum())(feat)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


class TestBallQuerySlab:
    """SA-layer slab ball query (win=128/spw=2, without-replacement)."""

    def test_counts_and_membership(self):
        # realistic tiling: many x-sorted centers per 128-query tile, as
        # SA1's 5120 centroids give — a handful of wide-spread centers
        # makes tiles wider than the selection span by construction
        pts = _cloud(B=1, N=9216, seed=3)   # 2.5D slab-friendly cloud
        rng = np.random.RandomState(4)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(7), jnp.asarray(pts),
                                CELL)
        M, K, R = 1024, 64, 0.04
        c = _sorted_centers(np.asarray(sc.xyz), M, rng)
        idx, cnt = slab.ball_query_slab(sc, jnp.asarray(c), jnp.uint32(9),
                                        R, K, CELL, interpret=True)
        xyz = np.asarray(sc.xyz)
        d2 = ((c[:, :, None] - xyz[:, None]) ** 2).sum(-1)
        ref_cnt = (d2 <= R * R).sum(-1)
        np.testing.assert_array_equal(np.asarray(cnt),
                                      np.minimum(ref_cnt, K))
        ii = np.asarray(idx)[0]
        sel_d2 = np.take_along_axis(d2[0], ii, axis=1)
        has = ref_cnt[0] > 0
        # every selected row of a non-empty query is in radius (the fill
        # convention repeats the row's first winner)
        frac_ok = float((sel_d2[has] <= R * R + 1e-9).all(axis=1).mean())
        assert frac_ok >= 0.99, frac_ok

    def test_distinct_neighbour_diversity(self):
        """The without-replacement selection must keep the distinct-
        neighbour count near the bucket path's on a DENSE cloud — the
        property whose loss broke the trained backbone on sorted input."""
        from regnet_for_3d_grasping_tpu.ops import ball_query

        rng = np.random.RandomState(5)
        N, M, K, R = 25600, 2048, 64, 0.02
        pts = rng.uniform(-0.3, 0.3, (1, N, 3)).astype(np.float32)
        pts[..., 2] *= 0.05                       # tabletop-like density
        _, sc = slab.sort_cloud(jax.random.PRNGKey(1), jnp.asarray(pts),
                                CELL)
        xyz = np.asarray(sc.xyz)
        c = _sorted_centers(xyz, M, rng)
        idx, cnt = slab.ball_query_slab(sc, jnp.asarray(c), jnp.uint32(3),
                                        R, K, CELL, interpret=True)
        bidx, bcnt = ball_query(jnp.asarray(pts), jnp.asarray(c), R, K,
                                method="bucket")
        ii, bi = np.asarray(idx)[0], np.asarray(bidx)[0]
        pop = np.asarray(cnt)[0]
        rows = pop >= 8                   # rows where diversity matters
        d_slab = np.array([len(np.unique(ii[m])) for m in range(M)])
        d_buck = np.array([len(np.unique(bi[m])) for m in range(M)])
        # the slab selection's distinct count is structurally capped at
        # ~(ball x-range / tile span) * K slots — about half the bucket
        # path's at this density.  What broke the trained backbone was
        # the 32 -> 7 collapse of *biased* (one-edge) samples; here the
        # picks stay uniform over the whole ball.  The quality arbiter
        # is the frozen-suite VGR gate (tools/benchmark_eval.py
        # --slab-cell); this test pins the floor so a regression to the
        # collapsed regime is caught on CPU.
        assert d_slab[rows].mean() >= 0.45 * d_buck[rows].mean(), (
            d_slab[rows].mean(), d_buck[rows].mean())
        assert d_slab[rows].mean() >= 12.0


class TestThreeNNSlab:
    def test_exact_when_proven(self):
        pts = _cloud(B=2, N=4096, seed=6)
        rng = np.random.RandomState(7)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(2), jnp.asarray(pts),
                                CELL)
        NK = 1024
        keys = np.stack([pts[b][rng.choice(pts.shape[1], NK, False)]
                         for b in range(pts.shape[0])])
        keys = np.stack([k[np.argsort(k[:, 0])] for k in keys])
        qi, qd, proven = slab.three_nn_slab(sc.xyz, jnp.asarray(keys),
                                            bound=0.08, interpret=True)
        xyz = np.asarray(sc.xyz)
        for b in range(2):
            dd = ((xyz[b][:, None] - keys[b][None]) ** 2).sum(-1)
            ref_i = np.argsort(dd, axis=1)[:, :3]
            ref_d = np.sort(dd, axis=1)[:, :3]
            got_i, got_d = np.asarray(qi)[b], np.asarray(qd)[b]
            if bool(np.asarray(proven)[b]):
                np.testing.assert_allclose(got_d, ref_d, atol=1e-9)
                same = (np.sort(got_i, 1) == np.sort(ref_i, 1)).all(1)
                assert same.all()
            else:
                # certificate correctly refuses: at least the flagged
                # queries must be the only mismatches
                same = (np.sort(got_i, 1) == np.sort(ref_i, 1)).all(1)
                margin_ok = got_d[:, 2] <= 0.08 ** 2  # conservative bound
                assert same[margin_ok].all()

    def test_grid_span_clamp_is_certified(self):
        """A too-small grid_span clamps tiles' scan windows (the BOUNDED
        fallback path — the flat sum-of-spans grid never clamps, so
        flat=False forces the path under test); every query whose true
        3-NN was excluded must be flagged by the certificate
        (proven=False), never silently wrong when proven=True."""
        pts = _cloud(B=2, N=4096, seed=6)
        rng = np.random.RandomState(7)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(2), jnp.asarray(pts),
                                CELL)
        NK = 4096                                 # 4 key blocks
        keys = np.stack([pts[b][rng.choice(pts.shape[1], NK, False)]
                         for b in range(pts.shape[0])])
        keys = np.stack([k[np.argsort(k[:, 0])] for k in keys])
        ref_i, ref_d, ref_p = slab.three_nn_slab(
            sc.xyz, jnp.asarray(keys), bound=0.08, grid_span=99,
            interpret=True)
        got_i, got_d, got_p = slab.three_nn_slab(
            sc.xyz, jnp.asarray(keys), bound=0.08, grid_span=1,
            flat=False, interpret=True)
        for b in range(2):
            if bool(np.asarray(got_p)[b]):
                np.testing.assert_allclose(np.asarray(got_d)[b],
                                           np.asarray(ref_d)[b], atol=1e-9)
        # with the whole table squeezed into 1 of 4 blocks, at least one
        # batch must be unproven (sanity that the clamp actually bit)
        assert not bool(np.asarray(got_p).all())

    def test_flat_grid_matches_full(self):
        """The flat sum-of-spans grid scans the same (unclamped) spans
        as the full grid, so results and certificates must agree."""
        pts = _cloud(B=2, N=4096, seed=12)
        rng = np.random.RandomState(21)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(9), jnp.asarray(pts),
                                CELL)
        NK = 4096                                 # 4 key blocks
        keys = np.stack([pts[b][rng.choice(pts.shape[1], NK, False)]
                         for b in range(pts.shape[0])])
        keys = np.stack([k[np.argsort(k[:, 0])] for k in keys])
        fl = slab.three_nn_slab(sc.xyz, jnp.asarray(keys), bound=0.08,
                                flat=True, interpret=True)
        fu = slab.three_nn_slab(sc.xyz, jnp.asarray(keys), bound=0.08,
                                grid_span=99, interpret=True)
        for a, b in zip(fl, fu):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_certificate_triggers_on_sparse_keys(self):
        """Keys clustered far from some queries -> unproven, and the FP
        fallback path returns the exact result anyway."""
        rng = np.random.RandomState(8)
        pts = rng.uniform(-0.3, 0.3, (1, 2048, 3)).astype(np.float32)
        _, sc = slab.sort_cloud(jax.random.PRNGKey(3), jnp.asarray(pts),
                                CELL)
        # >1 key block so distant queries can actually skip keys (a
        # single block is a full scan — trivially exact and proven)
        keys = rng.uniform(0.25, 0.3, (1, 2048, 3)).astype(np.float32)
        keys = keys[:, np.argsort(keys[0, :, 0])]
        qi, qd, proven = slab.three_nn_slab(sc.xyz, jnp.asarray(keys),
                                            bound=0.05, interpret=True)
        assert not bool(np.asarray(proven)[0])


class TestFP3FallbackObservability:
    """VERDICT r3 item 7: FeaturePropagation.nn_bound is a hardcoded
    metric-scale assumption — on clouds at a different scale the slab
    exactness certificate fails every batch and the full-scan fallback
    silently eats the slab win.  The event must be observable."""

    def _fp_data(self, scale):
        rng = np.random.RandomState(30)
        pts = rng.uniform(-0.35, 0.35, (1, 4096, 3)).astype(np.float32)
        pts[..., 2] *= 0.1
        pts *= scale
        pts = pts[:, np.argsort(pts[0, :, 0])]
        # independent keys (disjoint from the queries: coincident points
        # create exact-tie NN sets where the matmul-form bpdist2 and the
        # kernel's elementwise d2 can break ties differently)
        keys = rng.uniform(-0.35, 0.35, (1, 4096, 3)).astype(np.float32)
        keys[..., 2] *= 0.1
        keys *= scale
        sfeat = rng.randn(1, 4096, 8).astype(np.float32)
        return (jnp.asarray(pts), jnp.asarray(keys), jnp.asarray(sfeat))

    @pytest.mark.parametrize("scale,expect_fallback",
                             [(1.0, False), (20.0, True)])
    def test_fallback_counter(self, scale, expect_fallback):
        from regnet_for_3d_grasping_tpu.geometry import region as R
        from regnet_for_3d_grasping_tpu.models.backbone import (
            FeaturePropagation)
        from regnet_for_3d_grasping_tpu.ops import three_nn

        old = R.SLAB_INTERPRET
        R.SLAB_INTERPRET = True
        try:
            dense, keys, sfeat = self._fp_data(scale)
            fp = FeaturePropagation(mlp_channels=(16,), use_slab=True,
                                    nn_bound=0.06)
            variables = fp.init(jax.random.PRNGKey(0), dense, keys, None,
                                sfeat)
            out, inter = fp.apply(variables, dense, keys, None, sfeat,
                                  mutable=["intermediates"])
            cnt = int(inter["intermediates"]["fp3_slab_fallback"][0])
            assert (cnt > 0) == expect_fallback, (cnt, scale)

            # either way the layer output tracks the exact-path output.
            # The two paths round d2 differently (elementwise kernel vs
            # matmul-form bpdist2), giving ~1e-4 weight noise everywhere
            # and occasional near-tie 3rd-NN swaps — so compare by
            # quantile, not strict allclose.
            exact = FeaturePropagation(mlp_channels=(16,),
                                       use_slab=False)
            ref = exact.apply(variables, dense, keys, None, sfeat)
            d = np.abs(np.asarray(out) - np.asarray(ref))
            assert np.quantile(d, 0.99) < 2e-3, np.quantile(d, 0.99)
            assert (d > 1e-2).mean() < 0.005, (d > 1e-2).mean()
        finally:
            R.SLAB_INTERPRET = old


class TestSlabModelPath:
    def test_full_cascade_slab_mode(self):
        """End-to-end REGNet forward with region.slab_cell > 0 on the CPU
        (interpret-mode kernels): finite outputs, plausible validity, and
        the per-point score SET matches the non-slab forward up to
        sampling noise (the slab mode is a row permutation plus different
        selection draws)."""
        from regnet_for_3d_grasping_tpu.geometry import region as R
        from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
        from regnet_for_3d_grasping_tpu.models import REGNet
        from regnet_for_3d_grasping_tpu.utils.config import infer_config

        old = R.SLAB_INTERPRET
        R.SLAB_INTERPRET = True
        try:
            cfg = infer_config(**{"region.center_num": 256,
                                  "region.slab_cell": 0.04})
            model = REGNet(cfg)
            scene = make_synthetic_scene(0, num_view=cfg.region.num_points)
            pc = jnp.asarray(np.c_[
                scene["view_cloud"],
                scene["view_cloud_color"]].astype(np.float32)[None])
            variables = model.init({"params": jax.random.PRNGKey(0),
                                    "sampling": jax.random.PRNGKey(1)}, pc)
            out = model.apply(variables, pc, train=False,
                              rngs={"sampling": jax.random.PRNGKey(2)})
            for leaf in (out.score, out.proposals, out.final_grasps,
                         out.refine_logits):
                assert bool(jnp.all(jnp.isfinite(leaf)))
            assert float(out.region_valid.mean()) > 0.3
            assert float(out.crop_valid.mean()) > 0.3

            out0 = REGNet(infer_config(**{"region.center_num": 256})
                          ).apply(variables, pc, train=False,
                                  rngs={"sampling": jax.random.PRNGKey(2)})
            s1 = np.sort(np.asarray(out.score[0]))
            s0 = np.sort(np.asarray(out0.score[0]))
            np.testing.assert_allclose(s1, s0, atol=5e-3)
        finally:
            R.SLAB_INTERPRET = old

    def test_small_shapes_fall_back(self):
        """tiny shapes must not dispatch the slab kernels (span > cloud)."""
        from regnet_for_3d_grasping_tpu.geometry import region as R
        assert not R._use_slab_group(512, 16)
        assert not R._use_slab_crop(512, 16)
