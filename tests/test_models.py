"""Model forward-pass shape/sanity tests and loss smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.models import REGNet, ScoreNet
from regnet_for_3d_grasping_tpu.models.regnet import REGNetOutput
from regnet_for_3d_grasping_tpu.train.losses import regnet_losses
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def pc(cfg):
    rng = np.random.RandomState(0)
    B, N = 2, cfg.region.num_points
    xyz = rng.rand(B, N, 3).astype(np.float32) * 0.5
    xyz[..., 2] += 0.75
    rgb = rng.rand(B, N, 3).astype(np.float32)
    return jnp.asarray(np.concatenate([xyz, rgb], axis=-1))


@pytest.fixture(scope="module")
def model_and_vars(cfg, pc):
    model = REGNet(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, pc, train=False)
    return model, variables


class TestScoreNet:
    def test_shapes_and_range(self, cfg, pc):
        model = ScoreNet(cfg.model)
        variables = model.init(jax.random.PRNGKey(0), pc)
        feat, score = model.apply(variables, pc)
        B, N = pc.shape[:2]
        assert feat.shape == (B, N, cfg.model.feature_channels)
        assert score.shape == (B, N)
        s = np.asarray(score)
        assert (s >= 0).all() and (s <= 1).all()

    def test_train_mode_updates_batch_stats(self, cfg, pc):
        model = ScoreNet(cfg.model)
        variables = model.init(jax.random.PRNGKey(0), pc)
        _, mutated = model.apply(
            variables, pc, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after))


class TestREGNet:
    def test_forward_shapes(self, cfg, pc, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, pc,
                          rngs={"sampling": jax.random.PRNGKey(3)})
        B, N = pc.shape[:2]
        NC = cfg.region.center_num
        A = cfg.model.num_anchors
        R = cfg.model.reg_channels
        assert out.score.shape == (B, N)
        assert out.centers.shape == (B, NC, 6)
        assert out.cls_logits.shape == (B, NC, A)
        assert out.reg.shape == (B, NC, A, R)
        assert out.proposals.shape == (B, NC, R)
        assert out.refine_logits.shape == (B, NC, 2)
        assert out.final_grasps.shape == (B, NC, R)
        assert out.crop_valid.dtype == jnp.bool_

    def test_proposal_decode_consistency(self, cfg, pc, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, pc,
                          rngs={"sampling": jax.random.PRNGKey(3)})
        # axis_y of decoded proposals must be unit vectors
        norms = np.linalg.norm(np.asarray(out.proposals[..., 3:6]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # score channels came from a sigmoid
        s = np.asarray(out.proposals[..., 7:])
        assert (s >= 0).all() and (s <= 1).all()
        # proposal centers stay within `radius` of their candidate center
        d = np.linalg.norm(
            np.asarray(out.proposals[..., :3] - out.centers[..., :3]),
            axis=-1)
        # reg[:3] in (-inf, inf) pre-activation but after BN it's bounded in
        # practice; decode is reg*radius + center so just check finiteness
        assert np.isfinite(d).all()

    def test_losses_finite_and_positive(self, cfg, pc, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.RandomState(1)
        out = model.apply(variables, pc,
                          rngs={"sampling": jax.random.PRNGKey(3)})
        B, N = pc.shape[:2]
        NC = cfg.region.center_num
        score_gt = jnp.asarray(rng.rand(B, N).astype(np.float32))
        # fabricate GT labels near half of the proposals
        grasp_gt = np.full((B, NC, 10), -1.0, np.float32)
        matched = np.zeros((B, NC), bool)
        prop = np.asarray(out.proposals)
        for b in range(B):
            for c in range(0, NC, 2):
                matched[b, c] = True
                grasp_gt[b, c, :3] = prop[b, c, :3] + 0.01
                y = rng.randn(3)
                y[0] = abs(y[0])
                y /= np.linalg.norm(y)
                grasp_gt[b, c, 3:6] = y
                grasp_gt[b, c, 6] = 0.3
                grasp_gt[b, c, 7:] = 0.8
        total, metrics = regnet_losses(
            out, score_gt, jnp.asarray(grasp_gt), jnp.asarray(matched), cfg)
        assert np.isfinite(float(total))
        assert float(total) > 0
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_no_matches_gives_finite_loss(self, cfg, pc, model_and_vars):
        """Reference wraps this case in a bare try/except (train.py:430);
        here it must just work."""
        model, variables = model_and_vars
        out = model.apply(variables, pc,
                          rngs={"sampling": jax.random.PRNGKey(3)})
        B, N = pc.shape[:2]
        NC = cfg.region.center_num
        score_gt = jnp.zeros((B, N))
        grasp_gt = jnp.full((B, NC, 10), -1.0)
        matched = jnp.zeros((B, NC), bool)
        total, metrics = regnet_losses(out, score_gt, grasp_gt, matched, cfg)
        assert np.isfinite(float(total))

    def test_gradients_flow(self, cfg, pc, model_and_vars):
        """Stage-1/2 losses must backprop into ScoreNet and the GRN head.

        (The refine head only receives gradient when both refine classes are
        populated — geometrically impossible to guarantee with an untrained
        net, so it has its own targeted test below.)"""
        model, variables = model_and_vars
        B, N = pc.shape[:2]
        NC = cfg.region.center_num
        rng = np.random.RandomState(2)
        score_gt = jnp.asarray(rng.rand(B, N).astype(np.float32))
        grasp_gt = np.full((B, NC, 10), 0.1, np.float32)
        grasp_gt[..., 3:6] /= np.linalg.norm(grasp_gt[..., 3:6], axis=-1,
                                             keepdims=True)
        matched = jnp.ones((B, NC), bool)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                pc, train=True,
                rngs={"sampling": jax.random.PRNGKey(3),
                      "dropout": jax.random.PRNGKey(4)},
                mutable=["batch_stats"])
            total, _ = regnet_losses(out, score_gt, jnp.asarray(grasp_gt),
                                     matched, cfg)
            return total

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        for head in ["score_net", "grn_head"]:
            head_leaves = jax.tree.leaves(grads[head])
            assert any(np.abs(np.asarray(g)).sum() > 0
                       for g in head_leaves), head

    def test_refine_head_gradients(self, cfg, model_and_vars):
        """Targeted: stage-3 loss backprops into the refine head when both
        classes are present."""
        from regnet_for_3d_grasping_tpu.models.heads import RefineHead
        from regnet_for_3d_grasping_tpu.train.losses import stage3_losses

        model, variables = model_and_vars
        rng = np.random.RandomState(3)
        B, NC = 2, cfg.region.center_num
        K = cfg.region.gripper_num
        C = cfg.model.feature_channels
        R = cfg.model.reg_channels
        # heads take pooled features (gather+max happens in the caller)
        gripper_feat = jnp.max(
            jnp.asarray(rng.randn(B, NC, K, C).astype(np.float32)),
            axis=-2)
        pooled = jnp.asarray(rng.randn(B, NC, C).astype(np.float32))

        nxt = rng.randn(B, NC, R).astype(np.float32) * 0.05
        nxt[..., 3:6] /= np.linalg.norm(nxt[..., 3:6], axis=-1,
                                        keepdims=True)
        # GT: even rows positive (on top of proposal), odd rows negative
        grasp_gt = nxt.copy()
        grasp_gt[:, 1::2, 0] += 0.05
        matched = jnp.ones((B, NC), bool)

        head = RefineHead(cfg.model)
        hvars = head.init(jax.random.PRNGKey(0), gripper_feat, pooled)

        def loss_fn(params):
            logits, reg = head.apply(
                {"params": params, "batch_stats": hvars["batch_stats"]},
                gripper_feat, pooled, train=True,
                mutable=["batch_stats"])[0]
            final = jnp.concatenate(
                [nxt[..., :3] + reg[..., :3] * cfg.gripper.depth,
                 nxt[..., 3:] + reg[..., 3:]], axis=-1)
            out = REGNetOutput(
                score=jnp.zeros((B, 4)),
                centers=jnp.zeros((B, NC, 6)),
                center_index=jnp.zeros((B, NC), jnp.int32),
                region_valid=jnp.ones((B, NC), bool),
                cls_logits=jnp.zeros((B, NC, 4)),
                reg=jnp.zeros((B, NC, 4, R)),
                anchor_index=jnp.zeros((B, NC), jnp.int32),
                proposals=jnp.asarray(nxt),
                crop_valid=jnp.ones((B, NC), bool),
                refine_logits=logits,
                refine_reg=reg,
                final_grasps=final,
                refine_accept=jnp.argmax(logits, -1) == 1,
                score_accept=jnp.zeros((B, NC), bool),
            )
            return stage3_losses(out, jnp.asarray(grasp_gt), matched,
                                 cfg).loss

        val = loss_fn(hvars["params"])
        assert np.isfinite(float(val)) and float(val) > 0
        grads = jax.grad(loss_fn)(hvars["params"])
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)

    def test_deterministic_given_rngs(self, cfg, pc, model_and_vars):
        model, variables = model_and_vars
        o1 = model.apply(variables, pc,
                         rngs={"sampling": jax.random.PRNGKey(7)})
        o2 = model.apply(variables, pc,
                         rngs={"sampling": jax.random.PRNGKey(7)})
        np.testing.assert_array_equal(np.asarray(o1.final_grasps),
                                      np.asarray(o2.final_grasps))

    def test_accept_margin_monotone(self, cfg, pc, model_and_vars):
        """accept_margin 0 == argmax acceptance; raising the margin never
        accepts more grasps (calibration knob, region.accept_margin)."""
        import dataclasses
        model, variables = model_and_vars
        key = {"sampling": jax.random.PRNGKey(11)}
        out0 = model.apply(variables, pc, rngs=key)
        expect = (np.asarray(out0.refine_logits).argmax(-1) == 1) \
            & np.asarray(out0.crop_valid)
        np.testing.assert_array_equal(np.asarray(out0.refine_accept),
                                      expect)

        counts = []
        for margin in (-5.0, 0.0, 5.0):
            c = dataclasses.replace(cfg, region=dataclasses.replace(
                cfg.region, accept_margin=margin))
            out = REGNet(c).apply(variables, pc, rngs=key)
            counts.append(int(np.asarray(out.refine_accept).sum()))
        assert counts[0] >= counts[1] >= counts[2]
        # -5 margin accepts every crop-valid proposal
        out = REGNet(dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, accept_margin=-1e9))).apply(variables, pc, rngs=key)
        np.testing.assert_array_equal(np.asarray(out.refine_accept),
                                      np.asarray(out.crop_valid))

    def test_iterative_refinement(self, cfg, pc, model_and_vars):
        """refine_iters=1 is bitwise the single-shot path; >1 runs real
        re-crop + re-refine iterations (inference extension; the
        reference's --num-refine is defined but unused, train.py:27)."""
        import dataclasses
        model, variables = model_and_vars
        key = {"sampling": jax.random.PRNGKey(13)}
        base = model.apply(variables, pc, rngs=key)

        c1 = dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, refine_iters=1))
        out1 = REGNet(c1).apply(variables, pc, rngs=key)
        np.testing.assert_array_equal(np.asarray(base.final_grasps),
                                      np.asarray(out1.final_grasps))

        c3 = dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, refine_iters=3))
        out3 = REGNet(c3).apply(variables, pc, rngs=key)
        assert out3.final_grasps.shape == base.final_grasps.shape
        # the iterated grasps moved (random-weight residuals accumulate)
        moved = np.abs(np.asarray(out3.final_grasps)
                       - np.asarray(base.final_grasps)).max()
        assert moved > 0
        assert np.isfinite(np.asarray(out3.final_grasps)).all()

    def test_training_rejects_multi_iter_refine(self, cfg, pc):
        import dataclasses
        from regnet_for_3d_grasping_tpu.train import trainer
        c3 = dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, refine_iters=3))
        model = REGNet(c3)
        opt = trainer.make_optimizer(c3, steps_per_epoch=1)
        with pytest.raises(AssertionError, match="refine_iters"):
            trainer.make_train_step(model, opt, c3, stage="refine")


class TestBucketCenterSelect:
    def test_forward_with_bucket_center_select(self, cfg, pc,
                                               model_and_vars):
        """region.center_select='bucket' runs the full cascade with the
        same output structure and its centers are high-score points."""
        import dataclasses

        model, variables = model_and_vars
        c2 = dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, center_select="bucket"))
        out = REGNet(c2).apply(variables, pc, train=False,
                               rngs={"sampling": jax.random.PRNGKey(3)})
        B, NC = pc.shape[0], cfg.region.center_num
        assert out.centers.shape == (B, NC, pc.shape[-1])
        assert out.final_grasps.shape[1] == NC
        # selected centers carry scores above the threshold whenever the
        # cloud has enough positives (fallback rows aside)
        sc = np.asarray(out.score)
        idx = np.asarray(out.center_index)
        picked = np.take_along_axis(sc, idx, axis=1)
        for b in range(B):
            if (sc[b] > cfg.region.score_thre).sum() >= NC:
                assert (picked[b] > cfg.region.score_thre).all()


class TestRefinePoseAblation:
    """region.refine_pose serving knob (round 5): 'center' keeps the
    stage-2 orientation, 'off' keeps the whole stage-2 pose; both keep
    the refined score channels and the classifier acceptance."""

    def _run(self, cfg, pc, variables, pose):
        import dataclasses
        c = dataclasses.replace(cfg, region=dataclasses.replace(
            cfg.region, refine_pose=pose))
        return REGNet(c).apply(
            variables, pc, train=False,
            rngs={"sampling": jax.random.PRNGKey(21)})

    def test_center_keeps_stage2_orientation(self, cfg, pc,
                                             model_and_vars):
        model, variables = model_and_vars
        full = self._run(cfg, pc, variables, "full")
        cen = self._run(cfg, pc, variables, "center")
        # same crop stream -> identical proposals & classifier outputs
        np.testing.assert_array_equal(np.asarray(full.proposals),
                                      np.asarray(cen.proposals))
        np.testing.assert_array_equal(np.asarray(full.refine_logits),
                                      np.asarray(cen.refine_logits))
        f3, c3 = np.asarray(full.final_grasps), np.asarray(cen.final_grasps)
        p = np.asarray(full.proposals)
        # orientation channels come from stage 2, translation + scores
        # from the refinement
        np.testing.assert_array_equal(c3[..., 3:7], p[..., 3:7])
        np.testing.assert_array_equal(c3[..., :3], f3[..., :3])
        np.testing.assert_array_equal(c3[..., 7:], f3[..., 7:])

    def test_off_keeps_stage2_pose(self, cfg, pc, model_and_vars):
        model, variables = model_and_vars
        full = self._run(cfg, pc, variables, "full")
        off = self._run(cfg, pc, variables, "off")
        f3, o3 = np.asarray(full.final_grasps), np.asarray(off.final_grasps)
        p = np.asarray(full.proposals)
        np.testing.assert_array_equal(o3[..., :7], p[..., :7])
        np.testing.assert_array_equal(o3[..., 7:], f3[..., 7:])
        np.testing.assert_array_equal(np.asarray(off.refine_accept),
                                      np.asarray(full.refine_accept))
