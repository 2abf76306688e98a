"""EdgeConv set-abstraction / feature-propagation variants.

Library-parity port of the reference's Edge* module family
(``pn2_utils/modules.py``: EdgeQueryGrouper :65-95, EdgeFeatureInterpolator
:137-173, EdgeSAModule :408-477, EdgeFPModule :515-549, plus the
``gather_knn`` op it rides on, ``functions/gather_knn.py``).  These are
DEAD CODE in REGNet's forward path — no reference entry point constructs
them — but they complete the pn2 library surface for users building other
models on it.

EdgeConv augments each neighbourhood feature with its difference from the
centroid's (SA) / the interpolated (FP) feature, so the MLP sees both
absolute and relative ("edge") signals.  The reference's hand-written
gather_knn CUDA kernel (+ custom backward) is ``ops.group_points`` here —
identical gather semantics, XLA autodiff backward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from regnet_for_3d_grasping_tpu import ops
from regnet_for_3d_grasping_tpu.ops.knn import interpolation_weights
from regnet_for_3d_grasping_tpu.nn.layers import SharedMLP


class EdgeSetAbstraction(nn.Module):
    """SA with edge features: concat(group_xyz, neighbour feature,
    neighbour feature - centroid feature) -> MLP -> max.

    Reference EdgeSAModule (modules.py:408-477) with a sampler+grouper
    (num_centroids > 0, the only configuration its constructor wires for
    edge grouping).
    """

    num_centroids: int
    radius: float
    num_neighbours: int
    mlp_channels: Sequence[int]
    dtype: jnp.dtype | None = None
    ball_query_method: str = "bucket"

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """xyz [B,N,3], feature [B,N,C] -> (new_xyz [B,S,3], [B,S,C'])."""
        idx = ops.farthest_point_sample(xyz, self.num_centroids)
        new_xyz = ops.gather_points(xyz, idx)
        nidx, _ = ops.ball_query(xyz, new_xyz, self.radius,
                                 self.num_neighbours,
                                 method=self.ball_query_method)
        group_xyz = ops.group_points(xyz, nidx) - new_xyz[:, :, None, :]
        if feature is not None:
            centroid_feat = ops.gather_points(feature, idx)
            group_feat = ops.group_points(feature, nidx)
            edge = group_feat - centroid_feat[:, :, None, :]
            group = jnp.concatenate([group_xyz, group_feat, edge], axis=-1)
        else:
            group = group_xyz
        h = SharedMLP(self.mlp_channels, dtype=self.dtype,
                      name="mlp")(group, train=train)
        return new_xyz, jnp.max(h, axis=2)


class EdgeFeaturePropagation(nn.Module):
    """FP with edge features: concat(interpolated, neighbour - interpolated
    [, skip]) per 3-NN neighbour -> MLP -> mean over neighbours.

    Reference EdgeFPModule + EdgeFeatureInterpolator
    (modules.py:515-549, :137-173).
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
        interp = ops.three_interpolate(sparse_feature, idx, w)   # [B,N1,C2]
        gathered = ops.group_points(sparse_feature, idx)         # [B,N1,K,C2]
        K = self.num_neighbours
        interp_k = jnp.broadcast_to(
            interp[:, :, None, :], gathered.shape)
        parts = [interp_k, gathered - interp_k]
        if dense_feature is not None:
            parts.append(jnp.broadcast_to(
                dense_feature[:, :, None, :],
                dense_feature.shape[:2] + (K, dense_feature.shape[-1])))
        h = jnp.concatenate(parts, axis=-1)
        h = SharedMLP(self.mlp_channels, dtype=self.dtype,
                      name="mlp")(h, train=train)
        return jnp.mean(h, axis=2)
