"""Stage 1 — ScoreNet: per-point graspability regression.

Reference ``multi_model/score_network.py:9-53``.  The torch version also
constructs an unused k_obj classification head (score_network.py:14, never
trained — SURVEY §2.2); it is intentionally omitted here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from regnet_for_3d_grasping_tpu.models.backbone import PointNet2Seg
from regnet_for_3d_grasping_tpu.utils.config import ModelConfig


class ScoreNet(nn.Module):
    """Wraps the PointNet++ backbone; returns features + sigmoid scores."""

    config: ModelConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool = False,
                 sc=None, slab_cell: float = 0.0
                 ) -> Tuple[jax.Array, jax.Array]:
        """pc [B,N,6] -> (feature [B,N,256], score [B,N] in [0,1]).

        `sc`/`slab_cell`: sorted-slab kernel mode, see PointNet2Seg.
        """
        return PointNet2Seg(self.config, dtype=self.dtype,
                            name="backbone")(pc, train=train, sc=sc,
                                             slab_cell=slab_cell)
