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
from jax import lax

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
    # sorted-slab ball query (ops/slab.ball_query_slab): used when the
    # caller passes a SortedCloud over the SAME rows as `xyz`.  Scans only
    # each centroid tile's spatial slab; selection is without-replacement
    # per window (diversity ~= the bucket path's).  Quality-gated on the
    # frozen suite (tools/benchmark_eval.py --slab-cell).
    slab_cell: float = 0.0

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: Optional[jax.Array],
                 train: bool = False, sc=None
                 ) -> Tuple[jax.Array, jax.Array]:
        """xyz [B,N,3], feature [B,N,C] -> (new_xyz [B,S,3], feat [B,S,C'])."""
        idx = ops.farthest_point_sample(xyz, self.num_centroids,
                                        groups=self.fps_groups)
        new_xyz = ops.gather_points(xyz, idx)
        if sc is not None and self.slab_cell > 0.0:
            nidx = self._slab_ball_query(sc, new_xyz)
        else:
            nidx, _ = ops.ball_query(xyz, new_xyz, self.radius,
                                     self.num_neighbours,
                                     method=self.ball_query_method)
        # translation-normalized neighbourhood coords (modules.py:46).
        # Narrow features (SA1's rgb) ride the xyz gather: one 6-channel
        # row gather instead of two 3-channel ones (thin-row gathers are
        # row-count-bound, CLAUDE.md — merging halves the row fetches)
        if feature is not None and feature.shape[-1] <= 16:
            g = ops.group_points(
                jnp.concatenate([xyz, feature.astype(xyz.dtype)], -1),
                nidx)
            group_xyz = g[..., :3] - new_xyz[:, :, None, :]
            group_feat = jnp.concatenate(
                [group_xyz, g[..., 3:].astype(feature.dtype)], axis=-1)
        elif feature is not None:
            group_xyz = ops.group_points(xyz, nidx) \
                - new_xyz[:, :, None, :]
            group_feat = ops.group_points(feature, nidx)
            group_feat = jnp.concatenate([group_xyz, group_feat], axis=-1)
        else:
            group_feat = ops.group_points(xyz, nidx) \
                - new_xyz[:, :, None, :]
        h = SharedMLP(self.mlp_channels, dtype=self.dtype,
                      name="mlp")(group_feat, train=train)
        return new_xyz, jnp.max(h, axis=2)

    def _slab_ball_query(self, sc, new_xyz: jax.Array) -> jax.Array:
        """Slab ball query: x-sort the centroids for tile locality, then
        restore FPS order on the returned rows (the deeper SA layers'
        bucketed selection needs a spatially-mixed index order —
        models/regnet.py slab-mode rationale)."""
        from regnet_for_3d_grasping_tpu.geometry import region as _region
        from regnet_for_3d_grasping_tpu.ops import slab as _slab
        if self.has_rng("sampling"):
            key = self.make_rng("sampling")
            seed = jax.random.randint(key, (), 0, 2**31 - 1,
                                      dtype=jnp.int32).astype(jnp.uint32)
        else:
            seed = jnp.uint32(0x5A1B)
        c_ord = jnp.argsort(new_xyz[..., 0], axis=-1).astype(jnp.int32)
        c_sorted = jnp.take_along_axis(new_xyz, c_ord[..., None], axis=1)
        nidx_s, _cnt = _slab.ball_query_slab(
            sc, c_sorted, seed, self.radius, self.num_neighbours,
            self.slab_cell, interpret=_region.SLAB_INTERPRET)
        inv = jnp.argsort(c_ord, axis=-1).astype(jnp.int32)
        return jnp.take_along_axis(nidx_s, inv[..., None], axis=1)


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
    # sorted-slab 3-NN (ops/slab.three_nn_slab): exact ALWAYS — per-batch
    # exactness certificate with a full-scan lax.cond fallback.  Enable
    # only when dense_xyz is (cell-)x-sorted, or the slab bounds
    # degenerate to full scans.
    use_slab: bool = False
    nn_bound: float = 0.06

    @nn.compact
    def __call__(self, dense_xyz: jax.Array, sparse_xyz: jax.Array,
                 dense_feature: Optional[jax.Array],
                 sparse_feature: jax.Array,
                 train: bool = False) -> jax.Array:
        if self.use_slab and self.num_neighbours == 3:
            idx, d2, sparse_feature = self._slab_three_nn(
                dense_xyz, sparse_xyz, sparse_feature)
        else:
            idx, d2 = ops.three_nn(dense_xyz, sparse_xyz,
                                   self.num_neighbours)
        w = interpolation_weights(d2)
        interp = ops.three_interpolate(sparse_feature, idx, w)
        if dense_feature is not None:
            interp = jnp.concatenate([interp, dense_feature], axis=-1)
        return SharedMLP(self.mlp_channels, dtype=self.dtype,
                         name="mlp")(interp, train=train)

    def _slab_three_nn(self, dense_xyz: jax.Array, sparse_xyz: jax.Array,
                       sparse_feature: jax.Array
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Slab 3-NN: x-sort the keys, take the slab result when its
        exactness certificate holds for every query, else fall back to
        the full scan — the result is ALWAYS the exact 3-NN.

        Returned indices address the x-SORTED key order, with
        `sparse_feature` permuted to match — one fat [NK, C] row gather
        instead of remapping the [Nq, 3] index tensor (thin-row gathers
        run at 3/128 lane utilization, CLAUDE.md).  d2 comes straight
        from the kernel (f32, same arithmetic as ops.three_nn); the
        slab path is serving-only, so the xyz gradient ops.three_nn's
        d2 would carry is documented away rather than recomputed."""
        from regnet_for_3d_grasping_tpu.geometry import region as _region
        from regnet_for_3d_grasping_tpu.ops import slab as _slab
        k_ord = jnp.argsort(sparse_xyz[..., 0], axis=-1).astype(jnp.int32)
        key_sorted = jnp.take_along_axis(sparse_xyz, k_ord[..., None],
                                         axis=1)
        feat_sorted = jnp.take_along_axis(sparse_feature,
                                          k_ord[..., None], axis=1)
        idx_s, d2_s, proven = _slab.three_nn_slab(
            dense_xyz, key_sorted, bound=self.nn_bound,
            interpret=_region.SLAB_INTERPRET)
        # observability: count of batches whose certificate failed (the
        # lax.cond below then pays the full scan) — readable via
        # mutable=["intermediates"]; a persistent nonzero count means
        # `nn_bound` (ModelConfig.fp3_nn_bound) is mis-scaled for the
        # cloud's metric units and the slab win is silently lost
        self.sow("intermediates", "fp3_slab_fallback",
                 jnp.sum(jnp.logical_not(proven)).astype(jnp.int32))
        idx, d2 = lax.cond(
            jnp.all(proven),
            lambda: (idx_s, d2_s),
            lambda: ops.three_nn(dense_xyz, key_sorted, 3))
        return idx, d2, feat_sorted


class PointNet2Seg(nn.Module):
    """Per-point graspability scoring backbone.

    Returns both the 256-d per-point feature (consumed by the GRN/RefineNet
    stages, reference ``score_network.py:46-48``) and the sigmoid score.
    """

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False,
                 sc=None, slab_cell: float = 0.0
                 ) -> Tuple[jax.Array, jax.Array]:
        """points [B,N,6] (xyz+rgb) -> (feature [B,N,256], score [B,N]).

        `sc` (ops/slab.SortedCloud over the SAME rows as `points`) +
        `slab_cell` > 0 switch SA1's ball query and the last FP's 3-NN to
        the sorted-slab kernels (models/regnet.py passes these in slab
        mode; every other entry point leaves them off).
        """
        cfg = self.config
        xyz = points[..., :3]
        feature = points[..., 3:cfg.input_channels]
        if feature.shape[-1] == 0:
            feature = None
        use_slab = sc is not None and slab_cell > 0.0

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
                # only SA1's point set is the sorted cloud
                slab_cell=slab_cell if i == 0 else 0.0,
                name=f"sa{i}")(xyz, feature, train,
                               sc if (use_slab and i == 0) else None)
            inter_xyz.append(xyz)
            inter_feat.append(feature)

        sparse_xyz, sparse_feat = xyz, feature
        for i in range(len(cfg.fp_channels)):
            dense_xyz = inter_xyz[-2 - i]
            dense_feat = inter_feat[-2 - i]
            last = i == len(cfg.fp_channels) - 1
            sparse_feat = FP(
                mlp_channels=cfg.fp_channels[i],
                num_neighbours=cfg.num_fp_neighbours[i],
                dtype=self.dtype,
                # the last FP's dense level is the (sorted) input cloud —
                # the only level both big enough to matter and x-ordered
                use_slab=use_slab and last,
                nn_bound=cfg.fp3_nn_bound,
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
