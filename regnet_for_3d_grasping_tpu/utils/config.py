"""Single configuration tree for the whole framework.

The reference duplicates its constants across three files with
intentionally different values between train and inference
(``/root/reference/train.py:70-90``, ``/root/reference/test.py:61-81``,
``/root/reference/dataset_utils/eval_score/configs/config.py``).  Here one
dataclass tree holds everything, with ``train_config()`` / ``infer_config()``
presets reproducing the two reference presets.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class GripperConfig:
    """Two-finger parallel gripper geometry.

    Mirrors reference ``train.py:74`` (width/height/depth) and
    ``eval_score/configs/config.py:36-43`` (finger geometry).
    """

    width: float = 0.08    # max opening between fingers (y extent)
    height: float = 0.010  # hand thickness (z extent)
    depth: float = 0.06    # finger length along approach axis (x extent)

    # Evaluator-side geometry (config.py:37-43)
    finger_width: float = 0.01
    half_hand_thickness: float = 0.005
    finger_length: float = 0.06
    bottom_length: float = 0.06

    table_height: float = 0.75

    @property
    def hand_half_bottom_width(self) -> float:
        return self.width / 2 + self.finger_width

    @property
    def hand_half_bottom_space(self) -> float:
        return self.width / 2


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network architecture (reference ``multi_model/utils/pointnet2.py``)."""

    input_channels: int = 6          # xyz + rgb
    # PointNet2Seg backbone (pointnet2.py:40-46)
    num_centroids: Tuple[int, ...] = (5120, 1024, 256)
    radii: Tuple[float, ...] = (0.02, 0.08, 0.32)
    num_neighbours: Tuple[int, ...] = (64, 64, 64)
    sa_channels: Tuple[Tuple[int, ...], ...] = (
        (128, 128, 256), (256, 256, 512), (512, 512, 1024))
    fp_channels: Tuple[Tuple[int, ...], ...] = (
        (1024, 1024), (512, 512), (256, 256, 256))
    num_fp_neighbours: Tuple[int, ...] = (3, 3, 3)
    seg_channels: Tuple[int, ...] = (512, 256, 256, 128)
    dropout_prob: float = 0.5

    # GRN / RefineNet heads (pointnet2.py:123-254)
    num_anchors: int = 4             # orientation templates (grn:552-587)
    reg_channels: int = 10           # (dx,dy,dz,drx,dry,drz,dtheta,score,antipodal,center)
    feature_channels: int = 256      # backbone per-point feature (last FP output)
    refine_group_channels: int = 128 # group-feature slice fed to RefineNet

    # Ball-query neighbour selection: "bucket" (fast stratified pick) or
    # "exact" (the CUDA kernel's first-K-in-index-order semantics,
    # ball_query_kernel.cu:62-69 — used for value-parity checks)
    ball_query_method: str = "bucket"

    # Stratified approximate FPS at SA1 (ops/fps.py `groups`): 1 = exact
    # reference semantics (default); G>1 cuts the FPS stage's sequential
    # depth and work by G at a quality cost gated on the frozen benchmark
    # suite (tools/benchmark_eval.py)
    fps_groups: int = 1

    # Slab 3-NN scan bound for the last FP layer (ops/slab.three_nn_slab
    # `bound`, meters): keys within |kx - qx| <= bound of a query tile
    # are scanned; larger-scale clouds need a larger bound or every
    # batch trips the (exact but slow) full-scan fallback — the event is
    # observable via the "intermediates" collection
    # (fp3_slab_fallback, models/backbone.py)
    fp3_nn_bound: float = 0.06

    # Numerics
    compute_dtype: str = "float32"   # "bfloat16" for the fast path
    bn_momentum: float = 0.1         # torch convention; flax momentum = 1 - this
    bn_epsilon: float = 1e-5
    # Rematerialize SA/FP activations in backward (trades ~1 extra forward
    # for the SA1 activation memory — enables batch 12+ per chip)
    remat_backbone: bool = False


@dataclasses.dataclass(frozen=True)
class RegionConfig:
    """Proposal-region pipeline constants (reference ``train.py:70-90``)."""

    num_points: int = 25600      # all_points_num
    center_num: int = 64         # grasp-center candidates (4000 at inference)
    score_thre: float = 0.5      # graspability threshold for center selection
    group_num: int = 256         # points per proposal region
    group_num_more: int = 1024   # points per wide region (2048 at inference)
    r_time_group: float = 0.1    # radius = max(gripper dims) * r_time
    r_time_group_more: float = 0.8
    gripper_num: int = 64        # points kept inside the gripper closing region
    min_region_points: int = 5   # >5 inside points required (grn:539)
    grasp_score_thre: float = 0.5
    # Refine-classifier acceptance margin: accept iff
    # logit[valid] - logit[invalid] > margin.  0.0 reproduces the
    # reference's argmax acceptance (grn:210-215); calibrate on a
    # validation split with tools/calibrate_accept.py when running at
    # proposal scales far from the training center_num.
    accept_margin: float = 0.0
    # Iterative refinement: re-crop the closing region of the refined
    # grasp and re-run the refine head this many times.  The reference
    # defines --num-refine but never implements it (train.py:27); here >1
    # is a real INFERENCE-time extension (training requires 1 — the
    # stage-3 residual loss is defined against the stage-2 proposals).
    refine_iters: int = 1
    # Refinement-ablation serving knob (round 5).  The refine head can
    # hurt on domain-shifted inputs — on the reference's committed real
    # Kinect clouds it rotates the closing axis ~0.2-0.5 (vector delta)
    # while moving centers only ~1 cm, pushing stage-2 survivors into
    # back/finger collisions (docs/evidence/real_data_r5*.json).
    #   "full"   — reference behaviour: apply the whole residual.
    #   "center" — apply the translation + score residuals, keep the
    #              stage-2 orientation (axis_y, theta).
    #   "off"    — classifier-only: stage-2 pose + refined score; the
    #              refine stage becomes a pure acceptance gate.
    # Quality-gate like every serving knob (frozen suite + real-cloud
    # funnels, tools/benchmark_eval.py --refine-pose).
    refine_pose: str = "full"
    # Above-plane center prior (round 5, serving-only).  The evaluation
    # protocol's table plane is a fixed convention (the reference's
    # test.py evaluates real clouds at table_height=0.75 regardless of
    # where the scene's physical table sits — 0000_cloud's table is at
    # z~0.695), so grasp centers selected below the plane spend proposal
    # budget on protocol-rejected grasps.  When set, candidate centers
    # are restricted to points with z > center_min_z, falling back to
    # any-point-above-plane and then to the unmasked positives when the
    # mask empties (fixed shapes, reference fallback semantics).  None
    # (default) = reference behaviour.
    center_min_z: float | None = None
    # Serving-side pose search (round 5): enumerate K theta variants per
    # stage-2 proposal (45-degree grid at K=8, variant 0 = the predicted
    # theta) and keep the variant nearest the prediction that SURVIVES
    # the view-collision funnel (eval/collision.view_check_funnel on a
    # strided subsample of the cloud, f32).  Rescues out-of-domain
    # orientation regression: geometry picks the pose, the model keeps
    # center/axis_y/score.  0 = off (reference behaviour: one regressed
    # pose per center).  Quality-gate like every serving knob.
    pose_search_k: int = 0
    pose_search_subsample: int = 4   # cloud stride for the search funnel
    pose_search_table: float = 0.75  # protocol table plane for survival
    # Funnel-guarded refinement (round 5, serving-only): after the refine
    # stage, run the view-collision funnel on BOTH the refined pose and
    # its stage-2 input (full cloud, one extra fused check on the same
    # dispatch — tools/ab_eval_ondevice.py measured the funnel's on-chip
    # cost) and keep the refined pose only where it survives, falling
    # back to the stage-2 pose where THAT survives (score/classifier
    # channels always come from the refined head).  Serving guard for
    # out-of-domain refinement: on the committed real Kinect clouds the
    # refine residuals destroy stage-2 funnel survivors (241 -> 18 on
    # 0000_cloud, docs/evidence/real_data_r5_knobs.json); with the guard
    # stage-3 survivors are >= stage-2 survivors by construction.  The
    # reference has no equivalent (it always serves the refined pose,
    # gripper_region_network.py:210-215); defaults off.
    refine_guard: bool = False
    refine_guard_subsample: int = 1  # 1 = exact full-cloud funnel
    # Stratified approximate FPS for grasp-center selection (ops/fps.py
    # `groups`): 1 = exact (default); quality-gate changes like
    # ModelConfig.fps_groups
    center_fps_groups: int = 1
    # Center-selection algorithm: "fps" (reference semantics —
    # threshold + farthest-point spread over positives,
    # get_regiondataset.py:354-434) or "bucket" (serving option:
    # ops.bucket_choice one-pass stratified pick over positives, best
    # score per bucket — removes the center_num-step sequential FPS
    # loop entirely; at the 4000-center inference preset the FPS spread
    # matters far less than at the training 64.  Quality-gate like the
    # other approximation knobs: frozen suite + real-cloud funnels).
    center_select: str = "fps"
    # Sorted-slab geometry kernels (ops/slab.py): sort the cloud once by
    # (x-cell, random-within-cell) and scan only each query tile's slab
    # in the grouping/crop kernels.  0.0 = off (full scans, default);
    # > 0.0 = the cell size in meters (0.04 is the A/B'd setting).
    # Counts/validity stay exact; the point *selection* becomes
    # slab-stratified, which also reorders the model's per-point outputs
    # (clouds are sets; the permutation is consistent across outputs).
    # Quality-gated on the frozen suite like the FPS knobs.
    slab_cell: float = 0.0
    max_gt_grasps: int = 512     # static pad for per-scene ground-truth grasps
    # Reference quirk kept for parity: the center<->GT matching threshold 0.005
    # is applied to the SQUARED distance (get_regiondataset.py:114 with
    # _compute_distance returning squared dists), i.e. a ~7cm radius.
    gt_match_dist2: float = 0.005


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Geometric evaluator constants (``eval_score/configs/config.py``)."""

    num_points_threshold: int = 16
    close_region_min_points: int = 16
    back_collision_threshold: int = 0
    finger_collision_threshold: int = 0
    back_collision_margin: float = 0.0
    neighbor_depth: float = 0.005
    normal_radius: float = 0.01
    normal_max_nn: int = 30
    # fingertip-below-table tolerance; the reference flips its sign between
    # the test and validate paths (evaluation_data_generator.py:186 vs :428)
    table_offset: float = 0.005
    # soft guidance for exporters/evaluator batching (ops are chunk-padded
    # internally, so this is not a hard limit)
    max_grasps: int = 512


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 12
    epochs: int = 101
    lr_score: float = 1e-3
    lr_region: float = 1e-3
    lr_step_epochs: int = 5      # StepLR(step_size=5, gamma=0.5) (utils.py:120)
    lr_gamma: float = 0.5
    seed: int = 1
    data_parallel_axis: str = "data"


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    gripper: GripperConfig = dataclasses.field(default_factory=GripperConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    region: RegionConfig = dataclasses.field(default_factory=RegionConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @property
    def group_radius(self) -> float:
        g = self.gripper
        return max(g.width, g.height, g.depth) * self.region.r_time_group

    @property
    def group_radius_more(self) -> float:
        g = self.gripper
        return max(g.width, g.height, g.depth) * self.region.r_time_group_more


def train_config(**overrides) -> PipelineConfig:
    """Reference training preset (train.py:70-90): center_num=64,
    group_num_more=1024."""
    cfg = PipelineConfig()
    return _override(cfg, overrides)


def infer_config(**overrides) -> PipelineConfig:
    """Reference inference preset (test.py:61-81): center_num=4000,
    group_num_more=2048."""
    cfg = PipelineConfig(
        region=RegionConfig(center_num=4000, group_num_more=2048))
    return _override(cfg, overrides)


def tiny_config(**overrides) -> PipelineConfig:
    """Small shapes for unit tests / dry runs."""
    cfg = PipelineConfig(
        model=ModelConfig(num_centroids=(128, 32, 16),
                          num_neighbours=(8, 8, 8),
                          sa_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128)),
                          fp_channels=((128, 128), (64, 64), (32, 32, 32)),
                          seg_channels=(32, 32, 32, 32),
                          feature_channels=32,
                          refine_group_channels=16),
        region=RegionConfig(num_points=512, center_num=8, group_num=16,
                            group_num_more=32, gripper_num=16,
                            max_gt_grasps=32),
        eval=EvalConfig(max_grasps=32),
        train=TrainConfig(batch_size=2),
    )
    return _override(cfg, overrides)


def _override(cfg: PipelineConfig, overrides: dict) -> PipelineConfig:
    """Apply {'region.center_num': 4000}-style or section-level overrides."""
    for key, val in overrides.items():
        try:
            if "." in key:
                section, field = key.split(".", 1)
                sub = dataclasses.replace(getattr(cfg, section),
                                          **{field: val})
                cfg = dataclasses.replace(cfg, **{section: sub})
            else:
                cfg = dataclasses.replace(cfg, **{key: val})
        except TypeError as e:
            raise KeyError(
                f"unknown config override {key!r}: {e}; available fields "
                "are defined in utils/config.py") from e
    return cfg
