"""Loss-math unit tests with hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np

from regnet_for_3d_grasping_tpu.geometry.codec import anchor_templates
from regnet_for_3d_grasping_tpu.models.regnet import (
    REGNetOutput,
    decode_proposals,
)
from regnet_for_3d_grasping_tpu.train.losses import (
    cross_entropy,
    masked_mean,
    smooth_l1,
    stage2_losses,
    weighted_mean,
)
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


class TestPrimitives:
    def test_smooth_l1_matches_torch_definition(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        got = np.asarray(smooth_l1(x, jnp.zeros(5)))
        expect = np.array([1.5, 0.125, 0.0, 0.125, 1.5])
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_masked_mean(self):
        x = jnp.array([[1.0, 2.0], [3.0, 100.0]])
        m = jnp.array([[True, True], [True, False]])
        assert float(masked_mean(x, m)) == 2.0

    def test_masked_mean_broadcasts_channels(self):
        x = jnp.ones((2, 3, 4))
        m = jnp.array([[True, False, True], [False, False, False]])
        assert float(masked_mean(x, m)) == 1.0

    def test_masked_mean_empty_is_zero(self):
        assert float(masked_mean(jnp.ones((2, 2)),
                                 jnp.zeros((2, 2), bool))) == 0.0

    def test_cross_entropy(self):
        logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
        labels = jnp.array([0, 0])
        ce = np.asarray(cross_entropy(logits, labels))
        assert ce[0] < 1e-3 and ce[1] > 9.0

    def test_weighted_mean(self):
        x = jnp.array([1.0, 3.0])
        w = jnp.array([1.0, 0.0])
        assert float(weighted_mean(x, w)) == 1.0


class TestDecodeProposals:
    def test_known_decode(self):
        templates = np.asarray(anchor_templates())
        NC, A, R = 2, 4, 10
        reg = np.zeros((1, NC, A, R), np.float32)
        reg[0, 0, 1, :3] = [1.0, 0.0, 0.0]     # center offset
        reg[0, 0, 1, 6] = 0.5                  # theta residual
        reg[0, 0, 1, 7] = 0.9
        anchor_idx = jnp.array([[1, 0]])
        center = np.zeros((1, NC, 3), np.float32)
        center[0, 0] = [0.1, 0.2, 0.3]
        radius = 0.06
        out = np.asarray(decode_proposals(jnp.asarray(reg), anchor_idx,
                                          jnp.asarray(center), radius))
        np.testing.assert_allclose(out[0, 0, :3],
                                   [0.1 + 0.06, 0.2, 0.3], rtol=1e-5)
        # axis_y = normalize(0 + template_1)
        np.testing.assert_allclose(out[0, 0, 3:6], templates[1, :3],
                                   atol=1e-5)
        np.testing.assert_allclose(out[0, 0, 6], np.pi * 0.5, rtol=1e-5)
        np.testing.assert_allclose(out[0, 0, 7], 0.9, rtol=1e-5)


def _blank_output(cfg, B, NC, cls_logits, reg, centers, proposals,
                  anchor_index):
    R = cfg.model.reg_channels
    return REGNetOutput(
        score=jnp.zeros((B, 4)),
        centers=centers,
        center_index=jnp.zeros((B, NC), jnp.int32),
        region_valid=jnp.ones((B, NC), bool),
        cls_logits=cls_logits,
        reg=reg,
        anchor_index=anchor_index,
        proposals=proposals,
        crop_valid=jnp.ones((B, NC), bool),
        refine_logits=jnp.zeros((B, NC, 2)),
        refine_reg=jnp.zeros((B, NC, R)),
        final_grasps=proposals,
        refine_accept=jnp.zeros((B, NC), bool),
        score_accept=jnp.zeros((B, NC), bool),
    )


class TestStage2Math:
    def test_gt_anchor_assignment_and_perfect_regression(self):
        """GT exactly on anchor 2 with zero residual -> near-zero
        regression losses and 100% anchor accuracy when cls picks 2."""
        cfg = tiny_config()
        templates = np.asarray(anchor_templates())
        B, NC = 1, 4
        A, R = 4, cfg.model.reg_channels
        radius = cfg.gripper.depth

        centers = np.zeros((B, NC, 6), np.float32)
        centers[0, :, :3] = np.arange(NC)[:, None] * 0.5

        grasp_gt = np.full((B, NC, 10), -1.0, np.float32)
        matched = np.ones((B, NC), bool)
        grasp_gt[0, :, :3] = centers[0, :, :3]          # center == candidate
        grasp_gt[0, :, 3:6] = templates[2, :3]          # axis_y == anchor 2
        grasp_gt[0, :, 6] = 0.0
        grasp_gt[0, :, 7:] = 0.7

        reg = np.zeros((B, NC, A, R), np.float32)
        reg[..., 7:] = 0.7                              # perfect scores
        cls = np.full((B, NC, A), -10.0, np.float32)
        cls[..., 2] = 10.0                              # predict anchor 2

        anchor_idx = jnp.argmax(jnp.asarray(cls), -1)
        proposals = decode_proposals(jnp.asarray(reg), anchor_idx,
                                     jnp.asarray(centers[..., :3]), radius)
        out = _blank_output(cfg, B, NC, jnp.asarray(cls), jnp.asarray(reg),
                            jnp.asarray(centers), proposals, anchor_idx)
        res = stage2_losses(out, jnp.asarray(grasp_gt),
                            jnp.asarray(matched), cfg)
        m = {k: float(v) for k, v in res.metrics.items()}
        assert m["stage2_anchor_acc"] == 1.0
        assert m["stage2_loss_class"] < 1e-3
        assert m["stage2_loss_first1"] < 1e-6   # center residual 0
        assert m["stage2_loss_first3"] < 1e-6   # theta residual 0
        assert m["stage2_loss_first4"] < 1e-6   # score residual 0
        assert m["stage2_matched"] == NC

    def test_anchor_balance_weighting(self):
        """3 GT on anchor 0, 1 GT on anchor 1 -> anchor-0 samples weighted
        1/3 so both anchors contribute equally to the CE."""
        cfg = tiny_config()
        templates = np.asarray(anchor_templates())
        B, NC, A = 1, 4, 4
        R = cfg.model.reg_channels
        centers = np.zeros((B, NC, 6), np.float32)
        grasp_gt = np.zeros((B, NC, 10), np.float32)
        grasp_gt[0, :3, 3:6] = templates[0, :3]
        grasp_gt[0, 3, 3:6] = templates[1, :3]
        matched = np.ones((B, NC), bool)

        # logits: correct on anchor-0 rows, WRONG on the anchor-1 row
        cls = np.zeros((B, NC, A), np.float32)
        cls[0, :3, 0] = 5.0
        cls[0, 3, 0] = 5.0        # predicts 0, GT is 1
        cls = jnp.asarray(cls)
        reg = jnp.zeros((B, NC, A, R))
        anchor_idx = jnp.argmax(cls, -1)
        proposals = decode_proposals(reg, anchor_idx,
                                     jnp.asarray(centers[..., :3]), 0.06)
        out = _blank_output(cfg, B, NC, cls, reg, jnp.asarray(centers),
                            proposals, anchor_idx)
        res = stage2_losses(out, jnp.asarray(grasp_gt),
                            jnp.asarray(matched), cfg)
        # expected CE: anchor0 rows have CE ~ log-softmax correct (small),
        # anchor1 row CE = 5 + log(3 e^0 ... ) compute directly:
        logp = np.log(np.exp([5, 0, 0, 0.]) / np.exp([5, 0, 0, 0.]).sum())
        ce_correct = -logp[0]
        ce_wrong = -logp[1]
        # weights: anchor0 count 3 -> w = 1/3 each; anchor1 count 1 -> w=1
        expect = (3 * (1 / 3) * ce_correct + 1 * ce_wrong) / 2.0
        np.testing.assert_allclose(float(res.metrics["stage2_loss_class"]),
                                   expect, rtol=1e-4)
        np.testing.assert_allclose(float(res.metrics["stage2_anchor_acc"]),
                                   0.75, rtol=1e-6)
