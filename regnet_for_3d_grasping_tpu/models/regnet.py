"""REGNet — the full three-stage cascade, fixed-shape and mask-based.

Orchestrates ScoreNet -> GripperRegionNetwork -> RefineNet exactly as the
reference does across ``multi_model/gripper_region_network.py:361-434``
(forward), ``:311-359`` (refine_forward) and ``train.py``'s step functions —
but as one jittable module:

  * proposals live on a fixed [B, center_num] grid with validity masks
    instead of ``torch.nonzero`` compaction (SURVEY §7 hard part 1);
  * the region/grouping randomness comes from linen RNG stream "sampling";
  * the refine stage always runs (its inputs are masked), replacing the
    reference's data-dependent ``if len(gripper_mask) >= 2`` branch
    (grn:333) — invalid rows are excluded by masks downstream, which also
    removes the reference's silent batch-dropping try/except
    (train.py:363-435, SURVEY §5.3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from regnet_for_3d_grasping_tpu import ops
from regnet_for_3d_grasping_tpu.geometry.codec import (
    anchor_templates,
)
from regnet_for_3d_grasping_tpu.geometry import region as region_mod
from regnet_for_3d_grasping_tpu.geometry.region import (
    closing_region_crop_dense,
    dense_crop_stride,
    group_regions,
    group_stride,
    select_score_centers,
)
from regnet_for_3d_grasping_tpu.models.heads import RefineHead, TwoStageHead
from regnet_for_3d_grasping_tpu.models.score_net import ScoreNet
from regnet_for_3d_grasping_tpu.utils.config import PipelineConfig


class REGNetOutput(NamedTuple):
    """Everything the losses / evaluator / exporter need, masked not packed.

    Shapes: B batch, N points, NC centers, A anchors, R reg channels.
    """

    score: jax.Array            # [B, N] per-point graspability
    centers: jax.Array          # [B, NC, 6] candidate centers (xyz+rgb)
    center_index: jax.Array     # [B, NC]
    region_valid: jax.Array     # [B, NC] proposal region non-empty
    cls_logits: jax.Array       # [B, NC, A] anchor logits
    reg: jax.Array              # [B, NC, A, R] per-anchor residuals
    anchor_index: jax.Array     # [B, NC] argmax anchor
    proposals: jax.Array        # [B, NC, R] stage-2 decoded grasps
    crop_valid: jax.Array       # [B, NC] closing region had > min points
    refine_logits: jax.Array    # [B, NC, 2] valid/invalid logits
    refine_reg: jax.Array       # [B, NC, R] stage-3 residuals
    final_grasps: jax.Array     # [B, NC, R] stage-3 refined grasps
    refine_accept: jax.Array    # [B, NC] argmax(refine_logits) == 1
    score_accept: jax.Array     # [B, NC] accept & final score > threshold
    # slab mode only: original row of each output row ([B, N], else None).
    # Per-point outputs (score) come out in slab order; losses permute the
    # per-point GT by this (train/losses.py) — everything else in the
    # output is value-addressed and order-agnostic.
    point_order: Optional[jax.Array] = None


def decode_proposals(reg: jax.Array, anchor_idx: jax.Array,
                     center_xyz: jax.Array, radius: float) -> jax.Array:
    """Decode anchor residuals into grasps (grn compute_loss:82-90).

    reg [B,NC,A,R], anchor_idx [B,NC], center_xyz [B,NC,3] -> [B,NC,R]
    with (center, unit axis_y, theta, scores...).
    """
    templates = anchor_templates()                        # [A, 4]
    sel = jnp.take_along_axis(
        reg, anchor_idx[..., None, None], axis=-2)[..., 0, :]   # [B,NC,R]
    t = templates[anchor_idx]                             # [B,NC,4]
    center = sel[..., :3] * radius + center_xyz
    r_raw = sel[..., 3:6] + t[..., :3]
    r_norm = jnp.sqrt(jnp.sum(jnp.square(r_raw), axis=-1,
                              keepdims=True) + 1e-12)
    axis_y = r_raw / r_norm
    theta = jnp.pi * (sel[..., 6:7] + t[..., 3:4])
    return jnp.concatenate([center, axis_y, theta, sel[..., 7:]], axis=-1)


def pose_search_thetas(points: jax.Array, proposals: jax.Array, k: int,
                       subsample: int, table_height: float,
                       gripper) -> jax.Array:
    """Theta-grid pose search over stage-2 proposals (serving extension).

    For each proposal, build ``k`` theta variants (uniform 2*pi/k grid
    offsets; variant 0 is the regressed theta — cos/sin are periodic so
    no wrapping is needed) and run the view-collision funnel
    (eval/collision.view_check_funnel, test-path settings) against an
    f32 strided subsample of the cloud.  Keep the SURVIVING variant with
    the smallest circular grid distance to the prediction; fall back to
    the prediction when no variant survives.  Center, axis_y and score
    channels are untouched.

    Args:
      points: [B, N, 3] cloud (any order — the stride subsample is
        uniform on random-order clouds and spatially stratified on
        slab-sorted ones; both are valid selection samples).
      proposals: [B, NC, R] stage-2 decoded grasps.
    Returns [B, NC, R] with theta (channel 6) replaced.
    """
    from regnet_for_3d_grasping_tpu.eval.collision import view_check_funnel
    from regnet_for_3d_grasping_tpu.utils.config import EvalConfig

    ecfg = EvalConfig()
    nc = proposals.shape[1]
    offs = (2.0 * jnp.pi / k) * jnp.arange(k, dtype=jnp.float32)
    circ = jnp.minimum(jnp.arange(k), k - jnp.arange(k))   # grid distance

    def one(pts, props):
        sub = pts[::subsample].astype(jnp.float32)
        theta = props[:, 6:7].astype(jnp.float32) + offs[None, :]  # [NC,k]
        var = jnp.repeat(props[:, None, :8], k, axis=1)
        var = var.at[..., 6].set(theta.astype(var.dtype))
        masks = view_check_funnel(
            sub, var.reshape(nc * k, 8).astype(jnp.float32),
            table_height, gripper.depth, gripper, ecfg, table_sign=+1.0)
        surv = masks["survive"].reshape(nc, k)
        pick = surv.astype(jnp.int32) * (2 * k) - circ[None, :]
        kstar = jnp.where(surv.any(-1), jnp.argmax(pick, axis=-1), 0)
        th = jnp.take_along_axis(theta, kstar[:, None], axis=1)[:, 0]
        return props.at[:, 6].set(th.astype(props.dtype))

    return jax.vmap(one)(points, proposals)


def funnel_guard_refine(points: jax.Array, refined: jax.Array,
                        stage2: jax.Array, subsample: int,
                        table_height: float, gripper) -> jax.Array:
    """Survivor-preserving refinement guard (serving extension).

    Runs the view-collision funnel (eval/collision.view_check_funnel,
    test-path settings) on the refined pose AND its stage-2 input for
    every proposal, then serves per proposal:

      * the refined pose where it survives (refinement kept its win);
      * else the stage-2 pose where THAT survives (refinement broke a
        working grasp — undo it);
      * else the refined pose (reference behaviour — nothing survived).

    Score/classifier channels (7:) always come from the refined head —
    only the pose channels (center, axis_y, theta) are guarded, so the
    acceptance logic downstream is unchanged.  With ``subsample == 1``
    the funnel is exact, so every stage-2 survivor yields a stage-3
    survivor by construction.  The reference always serves the refined
    pose (gripper_region_network.py:210-215); this guard exists because
    an out-of-domain refine head can actively destroy funnel survivors
    (docs/evidence/real_data_r5_knobs.json: 241 -> 18 on 0000_cloud).
    """
    from regnet_for_3d_grasping_tpu.eval.collision import view_check_funnel
    from regnet_for_3d_grasping_tpu.utils.config import EvalConfig

    ecfg = EvalConfig()
    nc = refined.shape[1]

    def one(pts, ref, s2):
        sub = pts[::subsample].astype(jnp.float32)
        both = jnp.concatenate([ref[:, :8], s2[:, :8]]).astype(jnp.float32)
        masks = view_check_funnel(sub, both, table_height, gripper.depth,
                                  gripper, ecfg, table_sign=+1.0)
        surv_ref, surv_s2 = masks["survive"][:nc], masks["survive"][nc:]
        use_s2 = (~surv_ref) & surv_s2
        pose = jnp.where(use_s2[:, None], s2[:, :7].astype(ref.dtype),
                         ref[:, :7])
        return jnp.concatenate([pose, ref[:, 7:]], axis=-1)

    return jax.vmap(one)(points, refined, stage2)


class REGNet(nn.Module):
    """ScoreNet + GRN + RefineNet in one jittable forward."""

    cfg: PipelineConfig
    dtype: jnp.dtype | None = None

    def setup(self):
        self.score_net = ScoreNet(self.cfg.model, dtype=self.dtype)
        self.grn_head = TwoStageHead(self.cfg.model, dtype=self.dtype)
        self.refine_head = RefineHead(self.cfg.model, dtype=self.dtype)

    def __call__(self, pc: jax.Array, train: bool = False,
                 with_refine: bool = True) -> REGNetOutput:
        """pc [B, N, 6] -> REGNetOutput.

        `with_refine=False` reproduces the reference's `pretrain_region`
        configuration (GRN trained without the refine stage,
        utils.py:106-109) — the refine head still produces (masked) outputs
        so the return structure is static, but its inputs are detached
        regardless and its losses are simply not applied by the caller.
        """
        cfg = self.cfg
        region = cfg.region

        key = self.make_rng("sampling")

        # --- sorted-slab mode (region.slab_cell > 0): order the cloud by
        # (x-cell, random-within-cell) so the grouping/crop kernels scan
        # only each query tile's spatial slab (ops/slab.py).  When the
        # backbone's slab kernels qualify (TPU/interpret, SA1 K aligned),
        # the sort happens BEFORE the backbone and SA1/FP3 run slab too
        # (SA1's slab selection is without-replacement per window, so the
        # neighbor diversity the plain bucketed selection loses on a
        # sorted cloud — 32 -> 7 distinct, fatal to trained weights — is
        # restored by construction).  Otherwise the backbone sees the
        # original random-order cloud and only its outputs are re-sorted.
        # All per-point outputs come out in slab order (clouds are sets —
        # exporters/evaluator are order-agnostic).
        sc = None
        if region.slab_cell > 0.0:
            from regnet_for_3d_grasping_tpu.ops import slab as slab_ops
            key, k_sort = jax.random.split(key)
            if region_mod.use_slab_backbone(
                    pc.shape[1], cfg.model.num_neighbours[0]):
                pc, sc = slab_ops.sort_cloud(k_sort, pc, region.slab_cell)
                feature, score = self.score_net(
                    pc, train=train, sc=sc, slab_cell=region.slab_cell)
            else:
                feature, score = self.score_net(pc, train=train)
                pc, sc = slab_ops.sort_cloud(k_sort, pc, region.slab_cell)
                feature = jnp.take_along_axis(
                    feature, sc.order[..., None], axis=1)
                score = jnp.take_along_axis(score, sc.order, axis=1)
        else:
            feature, score = self.score_net(pc, train=train)
        k_group, k_crop = jax.random.split(key)

        # --- GRN: candidate centers + two region scales ------------------
        centers, center_idx = select_score_centers(
            pc, score, region.center_num, region.score_thre,
            groups=region.center_fps_groups,
            method=region.center_select,
            min_z=region.center_min_z)
        if sc is not None:
            # sort centers by x so each 128-center tile spans a narrow
            # slab (locality only — correctness is tile-independent)
            c_ord = jnp.argsort(centers[..., 0], axis=-1).astype(jnp.int32)
            centers = jnp.take_along_axis(centers, c_ord[..., None],
                                          axis=1)
            center_idx = jnp.take_along_axis(center_idx, c_ord, axis=1)
        # indices only — the cascade consumes backbone features gathered by
        # index, never the raw grouped points; the wide (group_num_more)
        # scale is not needed at all since the closing-region crop tests
        # the full cloud directly (closing_region_crop_dense)
        groups = group_regions(k_group, pc, centers, region.group_num,
                               cfg.group_radius, with_points=False,
                               sorted_cloud=sc, cell=region.slab_cell)

        # pooled per-region backbone feature (grn:389-395 + the head's
        # MaxPool1d) — fused gather+max, the [B,NC,G,C] gather is never
        # materialized (ops/pooling.py; slab variant when the slab
        # grouping produced the indices)
        if groups.slab_off is not None:
            from regnet_for_3d_grasping_tpu.ops import slab as slab_ops
            pooled = slab_ops.gather_max_slab_vjp(
                feature, groups.index, groups.slab_off,
                slab_ops.GROUP_WIN, slab_ops.GROUP_SPW,
                region_mod.SLAB_INTERPRET)
            pooled = jnp.where(groups.valid[..., None], pooled,
                               jnp.zeros((), pooled.dtype))
        else:
            pooled = ops.gather_max(
                feature, groups.index,
                stride=group_stride(region.center_num, pc.shape[1],
                                    region.group_num))
        cls_logits, reg = self.grn_head(pooled, train=train)
        anchor_idx = jnp.argmax(cls_logits, axis=-1)
        proposals = decode_proposals(reg, anchor_idx,
                                     centers[..., :3], cfg.gripper.depth)

        # --- serving-side pose search (RegionConfig.pose_search_k) -------
        # Enumerate K theta variants per proposal and keep the variant
        # nearest the regressed theta that survives the view-collision
        # funnel.  The theta regression is the one output that collapses
        # to its anchor prior on out-of-domain clouds (the committed real
        # Kinect clouds: approach_z ~ 0.04 predicted vs -0.94 reference,
        # docs/evidence/real_data_r5.json); the funnel is pure fixed-shape
        # geometry, so letting it pick theta rides the same dispatch.
        # Serving-only extension — the reference regresses one pose per
        # center (grn:82-90) and this knob defaults off.
        if region.pose_search_k > 0:
            proposals = pose_search_thetas(
                pc[..., :3], proposals, region.pose_search_k,
                region.pose_search_subsample, region.pose_search_table,
                cfg.gripper)

        # --- RefineNet: closing-region crop on detached proposals --------
        proposals_sg = jax.lax.stop_gradient(proposals)
        B, NC = proposals.shape[:2]
        if with_refine:
            # iterative refinement (region.refine_iters; 1 = reference
            # behaviour): re-crop around the refined grasp and re-run the
            # (shared-parameter) refine head
            cur = proposals_sg
            crop_valid = jnp.ones((B, NC), bool)
            for it in range(max(region.refine_iters, 1)):
                k_it = jax.random.fold_in(k_crop, it)
                crop = closing_region_crop_dense(
                    k_it, pc, cur, cfg.gripper,
                    region.gripper_num, region.min_region_points,
                    sorted_cloud=sc, cell=region.slab_cell)
                if crop.slab_off is not None:
                    from regnet_for_3d_grasping_tpu.ops import (
                        slab as slab_ops)
                    pooled_grip = slab_ops.gather_max_slab_vjp(
                        feature, crop.index_in_all, crop.slab_off,
                        slab_ops.CROP_WIN, slab_ops.CROP_SPW,
                        region_mod.SLAB_INTERPRET)
                    pooled_grip = jnp.where(
                        crop.valid[..., None], pooled_grip,
                        jnp.zeros((), pooled_grip.dtype))
                else:
                    pooled_grip = ops.gather_max(
                        feature, crop.index_in_all,
                        stride=dense_crop_stride(region.center_num,
                                                 pc.shape[1],
                                                 region.gripper_num))
                refine_logits, refine_reg = self.refine_head(
                    pooled_grip, pooled, train=train)
                nxt = jnp.concatenate(
                    [cur[..., :3] + refine_reg[..., :3] * cfg.gripper.depth,
                     cur[..., 3:] + refine_reg[..., 3:]], axis=-1)
                # refinement-ablation serving knob (RegionConfig.
                # refine_pose): optionally keep the stage-2 orientation
                # ("center") or the whole stage-2 pose ("off") while
                # still using the refined score + classifier; static
                # config, so XLA sees a single concat either way
                if region.refine_pose == "center":
                    nxt = jnp.concatenate(
                        [nxt[..., :3], cur[..., 3:7], nxt[..., 7:]],
                        axis=-1)
                elif region.refine_pose == "off":
                    nxt = jnp.concatenate(
                        [cur[..., :7], nxt[..., 7:]], axis=-1)
                # rows whose crop is empty are masked downstream
                # (refine_accept &= crop_valid), so the residual applies
                # unconditionally — identical to the single-shot path
                crop_valid = crop_valid & crop.valid
                cur = jax.lax.stop_gradient(nxt) \
                    if it + 1 < max(region.refine_iters, 1) else nxt
            final = cur
            # survivor-preserving guard (RegionConfig.refine_guard):
            # serve the stage-2 pose wherever refinement broke a funnel
            # survivor; pose channels only, acceptance logic untouched
            if region.refine_guard:
                final = funnel_guard_refine(
                    pc[..., :3], final, proposals_sg,
                    region.refine_guard_subsample,
                    region.pose_search_table, cfg.gripper)
            # margin 0.0 == the reference's argmax acceptance (grn:210-215)
            margin = region.accept_margin
            refine_accept = (refine_logits[..., 1] - refine_logits[..., 0]
                             > margin) & crop_valid
            score_accept = refine_accept \
                & (final[..., 7] > region.grasp_score_thre)
        else:
            # pretrain_region configuration: GRN without the refine stage
            # (utils.py:106-109); emit static-shape placeholders.
            R = cfg.model.reg_channels
            crop_valid = jnp.zeros((B, NC), bool)
            refine_logits = jnp.zeros((B, NC, 2), proposals.dtype)
            refine_reg = jnp.zeros((B, NC, R), proposals.dtype)
            final = proposals_sg
            refine_accept = jnp.zeros((B, NC), bool)
            score_accept = jnp.zeros((B, NC), bool)

        return REGNetOutput(
            score=score,
            centers=centers,
            center_index=center_idx,
            region_valid=groups.valid,
            cls_logits=cls_logits,
            reg=reg,
            anchor_index=anchor_idx,
            proposals=proposals,
            crop_valid=crop_valid,
            refine_logits=refine_logits,
            refine_reg=refine_reg,
            final_grasps=final,
            refine_accept=refine_accept,
            score_accept=score_accept,
            point_order=None if sc is None else sc.order,
        )
