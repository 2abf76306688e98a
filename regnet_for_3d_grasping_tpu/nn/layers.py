"""NN building blocks (flax.linen), channels-last.

Equivalents of the reference's ``pn2_utils/nn`` blocks
(``nn/modules/conv.py:6-83``, ``nn/modules/mlp.py:8-114``,
``nn/modules/linear.py``): pointwise conv + BatchNorm + ReLU stacks.  A
1x1 Conv1d/Conv2d over channels is just a Dense on the trailing axis, which
XLA maps straight onto the MXU — so one `ConvBN` covers the reference's
Conv1d, Conv2d and FC variants for every rank.

BatchNorm semantics match torch: momentum 0.1 (flax momentum = 0.9),
eps 1e-5, scale init 1 / bias init 0 (``nn/init.py:4-8``), statistics
reduced over every axis except channels — which for per-replica batch stats
under data parallelism reproduces the reference's DataParallel behaviour
(no cross-replica sync; SURVEY §5.8).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Pointwise dense layer + optional BatchNorm + optional ReLU."""

    features: int
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1   # torch convention
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, use_bias=not self.bn, dtype=self.dtype,
                     name="dense")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=1.0 - self.bn_momentum,
                             epsilon=1e-5, dtype=self.dtype,
                             name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of ConvBN blocks with optional dropout between layers.

    Reference: ``nn/modules/mlp.py:64-114`` (SharedMLP).  Rank-agnostic: the
    trailing axis is channels, all leading axes are "shared" (batch/points/
    neighbours).
    """

    channels: Sequence[int]
    dropout_prob: float = 0.0
    bn: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, ch in enumerate(self.channels):
            x = ConvBN(ch, bn=self.bn, dtype=self.dtype,
                       name=f"layer{i}")(x, train=train)
            if self.dropout_prob > 0.0:
                x = nn.Dropout(self.dropout_prob,
                               deterministic=not train)(x)
        return x
