"""Masked, fixed-shape training losses for the three-stage cascade.

Faithful re-derivations of the reference's loss math with every dynamic
index-set replaced by masks/weights:

  * stage 1 — MSE on sigmoid scores vs tanh-squashed GT
    (score_network.py:27, tanh applied in the dataset scoredataset.py:80).
  * stage 2 — anchor CE (anchor-balanced) + SmoothL1 residuals weighted
    10/5/1/1 (gripper_region_network.py:95-183).  The reference balances
    anchors by subsampling `min_count` members per anchor with
    np.random.choice (grn:111-133); here every GT-matched proposal gets
    weight `min_count / count(its anchor)` — identical in expectation,
    deterministic, and shape-static.
  * stage 3 — valid/invalid CE (class-balanced the same way, grn:259-263)
    + SmoothL1 residuals on positives (grn:222-269).

Each stage also emits the reference's diagnostic "pre" losses (decoded
prediction vs GT under the predicted anchor/class) with matching metric
names so tensorboard curves line up with the torch runs (utils.py:137-235).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from regnet_for_3d_grasping_tpu.geometry.codec import (
    anchor_templates,
    cos_dissimilarity,
)
from regnet_for_3d_grasping_tpu.models.regnet import REGNetOutput
from regnet_for_3d_grasping_tpu.utils.config import PipelineConfig


def smooth_l1(pred: jax.Array, target: jax.Array,
              beta: float = 1.0) -> jax.Array:
    """Elementwise SmoothL1 (torch default beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of x over True mask entries; 0 when the mask is empty.

    mask broadcasts against x's leading axes (trailing channel axes of x
    are averaged too, matching torch's reduction='mean' over all elements).
    """
    extra = x.ndim - mask.ndim
    if extra:
        mask = mask.reshape(mask.shape + (1,) * extra)
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def weighted_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    extra = x.ndim - w.ndim
    if extra:
        w = w.reshape(w.shape + (1,) * extra)
    num = jnp.sum(x * w)
    den = jnp.sum(jnp.broadcast_to(w, x.shape))
    return num / jnp.maximum(den, 1e-12)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-sample CE over the last axis (labels int)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def score_loss(pred_score: jax.Array, gt_score: jax.Array) -> jax.Array:
    """Stage-1 MSE (score_network.py:27)."""
    return jnp.mean(jnp.square(pred_score - gt_score))


class StageLosses(NamedTuple):
    loss: jax.Array
    metrics: Dict[str, jax.Array]


def stage2_losses(out: REGNetOutput, grasp_gt: jax.Array,
                  matched: jax.Array,
                  cfg: PipelineConfig) -> StageLosses:
    """GRN anchor classification + residual regression losses.

    Args:
      out: model forward output.
      grasp_gt: [B, NC, 10] matched GT labels (-1 rows for unmatched).
      matched: [B, NC] bool (the reference's `gmask`, grn:62).
    """
    radius = cfg.gripper.depth
    templates = anchor_templates()                        # [A, 4]
    gmask = matched & out.region_valid

    gt_y = grasp_gt[..., 3:6]
    # GT anchor by min cosine dissimilarity of axis_y (grn:100-105)
    sim = cos_dissimilarity(templates[None, None, :, :3],
                            gt_y[..., None, :])           # [B,NC,A]
    gt_anchor = jnp.argmin(sim, axis=-1)                  # [B,NC]

    # anchor-balanced CE weights (expectation-equivalent of grn:111-133)
    num_anchors = templates.shape[0]
    onehot = jax.nn.one_hot(gt_anchor, num_anchors) \
        * gmask[..., None].astype(jnp.float32)
    counts = jnp.sum(onehot, axis=(0, 1))                 # [A]
    nonzero = counts > 0
    min_count = jnp.min(jnp.where(nonzero, counts, jnp.inf))
    min_count = jnp.where(jnp.isfinite(min_count), min_count, 0.0)
    w = jnp.where(gmask, min_count / jnp.maximum(counts[gt_anchor], 1.0),
                  0.0)
    ce = cross_entropy(out.cls_logits, gt_anchor)
    loss_cls = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)

    # residual regression under the GT anchor (grn:143-160)
    reg_gt = jnp.take_along_axis(
        out.reg, gt_anchor[..., None, None], axis=-2)[..., 0, :]
    t = templates[gt_anchor]                              # [B,NC,4]
    l1 = masked_mean(
        smooth_l1(reg_gt[..., :3],
                  (grasp_gt[..., :3] - out.centers[..., :3]) / radius),
        gmask)
    r_raw = reg_gt[..., 3:6] + t[..., :3]
    sum_r = jnp.sqrt(jnp.sum(jnp.square(r_raw), axis=-1,
                             keepdims=True) + 1e-12)
    delta_r = reg_gt[..., 3:6] * sum_r                    # grn:148
    l2 = masked_mean(smooth_l1(delta_r, gt_y - t[..., :3]), gmask)
    l3 = masked_mean(
        smooth_l1(reg_gt[..., 6],
                  (grasp_gt[..., 6] - t[..., 3]) / jnp.pi), gmask)
    l4 = masked_mean(smooth_l1(reg_gt[..., 7:], grasp_gt[..., 7:]), gmask)

    loss = 10.0 * l1 + 5.0 * l2 + l3 + l4 + loss_cls      # grn:180

    # diagnostics under the predicted anchor (grn:163-175)
    pred = out.proposals
    acc = masked_mean((gt_anchor == out.anchor_index).astype(jnp.float32),
                      gmask)
    pre_center = masked_mean(smooth_l1(pred[..., :3], grasp_gt[..., :3]),
                             gmask)
    pre_cos = masked_mean(
        cos_dissimilarity(pred[..., 3:6], gt_y), gmask)
    pre_theta = masked_mean(smooth_l1(pred[..., 6], grasp_gt[..., 6]),
                            gmask)
    pre_score = masked_mean(smooth_l1(pred[..., 7:], grasp_gt[..., 7:]),
                            gmask)

    metrics = {
        "stage2_loss": loss,
        "stage2_loss_class": loss_cls,
        "stage2_loss_first1": l1,
        "stage2_loss_first2": l2,
        "stage2_loss_first3": l3,
        "stage2_loss_first4": l4,
        "stage2_anchor_acc": acc,
        "stage2_pre_loss_center": pre_center,
        "stage2_pre_loss_cos_orientation": pre_cos,
        "stage2_pre_loss_theta": pre_theta,
        "stage2_pre_loss_score": pre_score,
        "stage2_matched": jnp.sum(gmask.astype(jnp.float32)),
    }
    return StageLosses(loss, metrics)


def stage3_losses(out: REGNetOutput, grasp_gt: jax.Array,
                  matched: jax.Array,
                  cfg: PipelineConfig) -> StageLosses:
    """RefineNet valid/invalid classification + residual regression.

    Reference ``compute_loss_refine`` (grn:186-309); positives are GT-matched
    proposals whose stage-2 decode landed within 2.5cm / 60deg / 60deg of
    their GT (grn:227-236).
    """
    radius = cfg.gripper.depth
    valid = matched & out.crop_valid & out.region_valid

    nxt = jax.lax.stop_gradient(out.proposals)
    center_d = jnp.linalg.norm(nxt[..., :3] - grasp_gt[..., :3], axis=-1)
    r_sim = cos_dissimilarity(nxt[..., 3:6], grasp_gt[..., 3:6])
    theta_d = jnp.abs(nxt[..., 6] - grasp_gt[..., 6])
    gt_class = ((center_d < 0.025) & (r_sim < 0.5) & (theta_d < 1.047)
                & valid)

    pos = gt_class
    neg = valid & ~gt_class
    n_pos = jnp.sum(pos.astype(jnp.float32))
    n_neg = jnp.sum(neg.astype(jnp.float32))
    has_both = (n_pos > 0) & (n_neg > 0)

    ce = cross_entropy(out.refine_logits, gt_class.astype(jnp.int32))
    # class-balanced CE: 0.5 mean over each class
    ce_pos = jnp.sum(ce * pos) / jnp.maximum(n_pos, 1.0)
    ce_neg = jnp.sum(ce * neg) / jnp.maximum(n_neg, 1.0)
    loss_cls = jnp.where(has_both, 0.5 * (ce_pos + ce_neg), 0.0)

    reg = out.refine_reg
    l_center = masked_mean(
        smooth_l1(reg[..., :3], (grasp_gt[..., :3] - nxt[..., :3]) / radius),
        pos)
    l_r = masked_mean(
        smooth_l1(reg[..., 3:6], grasp_gt[..., 3:6] - nxt[..., 3:6]), pos)
    l_theta = masked_mean(
        smooth_l1(reg[..., 6], grasp_gt[..., 6] - nxt[..., 6]), pos)
    l_score = masked_mean(
        smooth_l1(reg[..., 7:], grasp_gt[..., 7:] - nxt[..., 7:]), pos)
    loss_reg = jnp.where(has_both,
                         l_center + l_r + l_theta + l_score, 0.0)
    loss = loss_cls + loss_reg

    pred_cls = out.refine_accept
    tp = jnp.sum((gt_class & pred_cls & valid).astype(jnp.float32))
    tn = jnp.sum((~gt_class & ~pred_cls & valid).astype(jnp.float32))
    fp = jnp.sum((~gt_class & pred_cls & valid).astype(jnp.float32))
    fn = jnp.sum((gt_class & ~pred_cls & valid).astype(jnp.float32))
    acc = (tp + tn) / jnp.maximum(tp + tn + fp + fn, 1.0)

    final = out.final_grasps
    csel = pred_cls & valid
    ssel = out.score_accept & valid

    def _pre(sel, grasp):
        return {
            "center": masked_mean(
                smooth_l1(grasp[..., :3], grasp_gt[..., :3]), sel),
            "cos_orientation": masked_mean(
                cos_dissimilarity(grasp[..., 3:6], grasp_gt[..., 3:6]), sel),
            "theta": masked_mean(
                smooth_l1(grasp[..., 6], grasp_gt[..., 6]), sel),
            "score": masked_mean(
                smooth_l1(grasp[..., 7:], grasp_gt[..., 7:]), sel),
        }

    pre3 = _pre(csel, final)
    pre3_s2 = _pre(csel, nxt)
    pre3_score = _pre(ssel, final)

    metrics = {
        "stage3_loss": loss,
        "stage3_loss_class": loss_cls,
        "stage3_loss_first1": l_center,
        "stage3_loss_first2": l_r,
        "stage3_loss_first3": l_theta,
        "stage3_loss_first4": l_score,
        "stage3_refine_acc": acc,
        "stage3_tp": tp, "stage3_tn": tn, "stage3_fp": fp, "stage3_fn": fn,
        "stage3_positives": n_pos,
    }
    for k, v in pre3.items():
        metrics[f"stage3_pre_loss_{k}"] = v
    for k, v in pre3_s2.items():
        metrics[f"stage3_pre_loss_{k}_stage2"] = v
    for k, v in pre3_score.items():
        metrics[f"stage3_pre_loss_{k}_score"] = v
    return StageLosses(loss, metrics)


def regnet_losses(out: REGNetOutput, pc_score_gt: jax.Array,
                  grasp_gt: jax.Array, matched: jax.Array,
                  cfg: PipelineConfig,
                  with_stage2: bool = True,
                  with_stage3: bool = True
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Joint loss = SN + GRN + RN (train.py:369-371).

    In slab mode the model's per-point score comes out in slab order
    (models/regnet.py); `out.point_order` carries the permutation, and the
    per-point GT is permuted to match (GT has no gradient — one thin [B,N]
    gather).  Every other loss input is value-addressed (center xyz vs GT
    grasp xyz) and therefore order-agnostic.
    """
    if out.point_order is not None:
        pc_score_gt = jnp.take_along_axis(pc_score_gt, out.point_order,
                                          axis=1)
    l1 = score_loss(out.score, pc_score_gt)
    metrics = {"stage1_loss_score": l1}
    total = l1
    if with_stage2:
        s2 = stage2_losses(out, grasp_gt, matched, cfg)
        total = total + s2.loss
        metrics.update(s2.metrics)
    if with_stage3:
        s3 = stage3_losses(out, grasp_gt, matched, cfg)
        total = total + s3.loss
        metrics.update(s3.metrics)
    metrics["loss_total"] = total
    return total, metrics
