"""Proposal and refinement heads.

Re-design of ``multi_model/utils/pointnet2.py:123-254``:

  * `TwoStageHead`  — per-proposal anchor classification + residual
    regression (reference ``PointNet2TwoStage``).  Consumes the POOLED
    region feature (max over the `group_num` points around each candidate
    center) and emits (anchor logits, per-anchor residuals).
  * `RefineHead`    — per-proposal valid/invalid classification + residual
    regression (reference ``PointNet2Refine``).  Consumes the pooled
    closing-region feature plus a slice of the pooled group feature.

The reference's heads take the un-pooled [.., NG, C] gathered features and
MaxPool1d them internally (pointnet2.py:165-189, :227-254); here the pool
happens in the caller via ``ops.gather_max`` so the [B, NC, NG, C] gather
(524 MB at the inference preset) is never materialized — the heads' math
from the pooled vector onward is unchanged.

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
    def __call__(self, pooled: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """pooled [..., C] (max over the region's point features) ->
        (cls [..., A], reg [..., A, R])."""
        cfg = self.config
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
        return c, r


class RefineHead(nn.Module):
    """Valid/invalid cls + residual reg over closing-region features."""

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, pooled: jax.Array,
                 group_feature: Optional[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """pooled [..., C] (max over the closing-region point features),
        group_feature [..., C2] -> (cls [..., 2], reg [..., R])."""
        cfg = self.config
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
