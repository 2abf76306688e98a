"""Proposal and refinement heads.

Re-design of ``multi_model/utils/pointnet2.py:123-254``:

  * `TwoStageHead`  — per-proposal anchor classification + residual
    regression (reference ``PointNet2TwoStage``).  Consumes the 256-d
    backbone features of the `group_num` points around each candidate
    center, max-pools them, and emits (anchor logits, per-anchor residuals,
    the pooled 256-d group feature).
  * `RefineHead`    — per-proposal valid/invalid classification + residual
    regression (reference ``PointNet2Refine``).  Consumes the features of
    the `gripper_num` points inside the closing region plus a slice of the
    pooled group feature.

Proposals are batched as a leading [B, NC] grid (fixed shapes + masks), not
the reference's dynamically-compacted [B*NC'] rows.  BatchNorm therefore
normalizes over (B, NC) — same population as the reference's flattened rows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from regnet_for_3d_grasping_tpu.nn.layers import ConvBN
from regnet_for_3d_grasping_tpu.utils.config import ModelConfig


class TwoStageHead(nn.Module):
    """Anchor cls + residual reg over pooled proposal-region features."""

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, group_feature: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """group_feature [..., NG, C] -> (cls [..., A], reg [..., A, R],
        pooled [..., C])."""
        cfg = self.config
        pooled = jnp.max(group_feature, axis=-2)          # MaxPool1d(NG)
        x = ConvBN(1024, dtype=self.dtype, name="stem")(pooled, train=train)

        c = ConvBN(256, dtype=self.dtype, name="cls1")(x, train=train)
        c = ConvBN(128, dtype=self.dtype, name="cls2")(c, train=train)
        c = ConvBN(cfg.num_anchors, relu=False, dtype=self.dtype,
                   name="cls3")(c, train=train)

        r = ConvBN(256, dtype=self.dtype, name="reg1")(x, train=train)
        r = ConvBN(128, dtype=self.dtype, name="reg2")(r, train=train)
        r = ConvBN(cfg.num_anchors * cfg.reg_channels, relu=False,
                   dtype=self.dtype, name="reg3")(r, train=train)
        r = r.reshape(r.shape[:-1] + (cfg.num_anchors, cfg.reg_channels))
        # sigmoid on the score channels (pointnet2.py:189)
        r = jnp.concatenate(
            [r[..., :7], nn.sigmoid(r[..., 7:])], axis=-1)
        return c, r, pooled


class RefineHead(nn.Module):
    """Valid/invalid cls + residual reg over closing-region features."""

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, gripper_feature: jax.Array,
                 group_feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """gripper_feature [..., K, C], group_feature [..., C2] ->
        (cls [..., 2], reg [..., R])."""
        cfg = self.config
        pooled = jnp.max(gripper_feature, axis=-2)
        if group_feature is not None:
            # The reference slices the pooled 256-d group feature to 128 via
            # a buggy view(-1,128) reinterpretation (grn.py:343); here we
            # take the first `refine_group_channels` dims of the *correct*
            # proposal's feature — same capacity, sane indexing.
            pooled = jnp.concatenate(
                [pooled, group_feature[..., :cfg.refine_group_channels]],
                axis=-1)
        x = ConvBN(1024, dtype=self.dtype, name="stem")(pooled, train=train)

        c = ConvBN(128, dtype=self.dtype, name="cls1")(x, train=train)
        c = ConvBN(2, relu=False, dtype=self.dtype,
                   name="cls2")(c, train=train)

        r = ConvBN(128, dtype=self.dtype, name="reg1")(x, train=train)
        r = ConvBN(cfg.reg_channels, relu=False, dtype=self.dtype,
                   name="reg2")(r, train=train)
        return c, r
