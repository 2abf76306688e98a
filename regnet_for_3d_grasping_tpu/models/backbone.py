"""PointNet++ segmentation backbone, TPU-native.

Re-design of the reference ``multi_model/utils/pointnet2.py:12-121``
(PointNet2Seg) and its SA/FP modules (``pn2_utils/modules.py:176-252,
480-512``).  Channels-last throughout; the sampling/grouping index
computations are non-differentiable (the reference wraps them in
``torch.no_grad()``, ``modules.py:24,40``) and sit outside the gradient path
here by construction (integer indices).

Architecture (exactly the reference config, pointnet2.py:40-46):
  SA: centroids (5120,1024,256), radii (0.02,0.08,0.32), 64 neighbours,
      MLPs ((128,128,256),(256,256,512),(512,512,1024))
  FP: ((1024,1024),(512,512),(256,256,256)) with 3-NN inverse-sq-distance
      interpolation
  head: SharedMLP (512,256,256,128) dropout 0.5 -> Dense 1 + BN + sigmoid
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from regnet_for_3d_grasping_tpu import ops
from regnet_for_3d_grasping_tpu.ops.knn import interpolation_weights
from regnet_for_3d_grasping_tpu.nn.layers import SharedMLP
from regnet_for_3d_grasping_tpu.utils.config import ModelConfig


class SetAbstraction(nn.Module):
    """FPS -> ball-query grouping -> shared MLP -> neighbourhood max-pool.

    Reference ``PointNetSAModule`` (modules.py:176-252) with single-scale
    grouping and use_xyz=True.
    """

    num_centroids: int
    radius: float
    num_neighbours: int
    mlp_channels: Sequence[int]
    dtype: jnp.dtype | None = None
    ball_query_method: str = "bucket"
    # >1 = stratified approximate FPS (ops/fps.py groups param); exact by
    # default — quality-gate any change with tools/benchmark_eval.py
    fps_groups: int = 1

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """xyz [B,N,3], feature [B,N,C] -> (new_xyz [B,S,3], feat [B,S,C'])."""
        idx = ops.farthest_point_sample(xyz, self.num_centroids,
                                        groups=self.fps_groups)
        new_xyz = ops.gather_points(xyz, idx)
        nidx, _ = ops.ball_query(xyz, new_xyz, self.radius,
                                 self.num_neighbours,
                                 method=self.ball_query_method)
        # translation-normalized neighbourhood coords (modules.py:46)
        group_xyz = ops.group_points(xyz, nidx) - new_xyz[:, :, None, :]
        if feature is not None:
            group_feat = ops.group_points(feature, nidx)
            group_feat = jnp.concatenate([group_xyz, group_feat], axis=-1)
        else:
            group_feat = group_xyz
        h = SharedMLP(self.mlp_channels, dtype=self.dtype,
                      name="mlp")(group_feat, train=train)
        return new_xyz, jnp.max(h, axis=2)


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA: several (radius, K) scales concatenated.

    Reference ``PointNetSAModuleMSG`` (modules.py:137-174) — present in the
    reference library but unused by REGNet's forward path; provided for
    library parity.
    """

    num_centroids: int
    radii: Sequence[float]
    num_neighbours: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        idx = ops.farthest_point_sample(xyz, self.num_centroids)
        new_xyz = ops.gather_points(xyz, idx)
        outs = []
        for i, (radius, k) in enumerate(zip(self.radii,
                                            self.num_neighbours)):
            nidx, _ = ops.ball_query(xyz, new_xyz, radius, k)
            group_xyz = ops.group_points(xyz, nidx) - new_xyz[:, :, None, :]
            if feature is not None:
                gf = jnp.concatenate(
                    [group_xyz, ops.group_points(feature, nidx)], axis=-1)
            else:
                gf = group_xyz
            h = SharedMLP(self.mlp_channels[i], dtype=self.dtype,
                          name=f"mlp{i}")(gf, train=train)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAvg(nn.Module):
    """Mean-pooled SA variant (reference ``PointNetSAAvgModule``,
    modules.py:255-...; unused by REGNet's forward path)."""

    num_centroids: int
    radius: float
    num_neighbours: int
    mlp_channels: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        idx = ops.farthest_point_sample(xyz, self.num_centroids)
        new_xyz = ops.gather_points(xyz, idx)
        nidx, count = ops.ball_query(xyz, new_xyz, self.radius,
                                     self.num_neighbours)
        group_xyz = ops.group_points(xyz, nidx) - new_xyz[:, :, None, :]
        if feature is not None:
            gf = jnp.concatenate(
                [group_xyz, ops.group_points(feature, nidx)], axis=-1)
        else:
            gf = group_xyz
        h = SharedMLP(self.mlp_channels, dtype=self.dtype,
                      name="mlp")(gf, train=train)
        return new_xyz, jnp.mean(h, axis=2)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance interpolation -> concat skip -> shared MLP.

    Reference ``PointnetFPModule`` (modules.py:480-512) + FeatureInterpolator
    (modules.py:98-134).
    """

    mlp_channels: Sequence[int]
    num_neighbours: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, dense_xyz: jax.Array, sparse_xyz: jax.Array,
                 dense_feature: Optional[jax.Array],
                 sparse_feature: jax.Array,
                 train: bool = False) -> jax.Array:
        idx, d2 = ops.three_nn(dense_xyz, sparse_xyz, self.num_neighbours)
        w = interpolation_weights(d2)
        interp = ops.three_interpolate(sparse_feature, idx, w)
        if dense_feature is not None:
            interp = jnp.concatenate([interp, dense_feature], axis=-1)
        return SharedMLP(self.mlp_channels, dtype=self.dtype,
                         name="mlp")(interp, train=train)


class PointNet2Seg(nn.Module):
    """Per-point graspability scoring backbone.

    Returns both the 256-d per-point feature (consumed by the GRN/RefineNet
    stages, reference ``score_network.py:46-48``) and the sigmoid score.
    """

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, points: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """points [B,N,6] (xyz+rgb) -> (feature [B,N,256], score [B,N])."""
        cfg = self.config
        xyz = points[..., :3]
        feature = points[..., 3:cfg.input_channels]
        if feature.shape[-1] == 0:
            feature = None

        # optional activation rematerialization (train-memory knob):
        # the neighbourhood-expanded SA tensors ([B,S,K,C]) dominate
        # training memory; remat recomputes them in backward
        # static_argnums index includes the module as args[0]
        SA = nn.remat(SetAbstraction, static_argnums=(3,)) \
            if cfg.remat_backbone else SetAbstraction
        FP = nn.remat(FeaturePropagation, static_argnums=(5,)) \
            if cfg.remat_backbone else FeaturePropagation

        inter_xyz = [xyz]
        inter_feat = [feature]
        for i in range(len(cfg.num_centroids)):
            xyz, feature = SA(
                num_centroids=cfg.num_centroids[i],
                radius=cfg.radii[i],
                num_neighbours=cfg.num_neighbours[i],
                mlp_channels=cfg.sa_channels[i],
                dtype=self.dtype,
                ball_query_method=cfg.ball_query_method,
                # SA1 holds ~96% of the FPS work (S*N); deeper layers
                # stay exact — their inputs are FPS-ordered, not random
                fps_groups=cfg.fps_groups if i == 0 else 1,
                name=f"sa{i}")(xyz, feature, train)
            inter_xyz.append(xyz)
            inter_feat.append(feature)

        sparse_xyz, sparse_feat = xyz, feature
        for i in range(len(cfg.fp_channels)):
            dense_xyz = inter_xyz[-2 - i]
            dense_feat = inter_feat[-2 - i]
            sparse_feat = FP(
                mlp_channels=cfg.fp_channels[i],
                num_neighbours=cfg.num_fp_neighbours[i],
                dtype=self.dtype,
                name=f"fp{i}")(dense_xyz, sparse_xyz, dense_feat,
                               sparse_feat, train)
            sparse_xyz = dense_xyz

        # sparse_feat is the 256-d per-point feature returned to GRN
        # (pointnet2.py:121 returns it before the seg head).
        x = SharedMLP(cfg.seg_channels, dropout_prob=cfg.dropout_prob,
                      dtype=self.dtype, name="seg_mlp")(sparse_feat,
                                                        train=train)
        x = nn.Dense(1, use_bias=False, dtype=self.dtype,
                     name="score_dense")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - cfg.bn_momentum, epsilon=1e-5,
                         dtype=self.dtype, name="score_bn")(x)
        # scores feed threshold comparisons (center selection) — keep f32
        # even under a bf16 compute dtype
        score = nn.sigmoid(x.astype(jnp.float32))[..., 0]
        return sparse_feat, score
