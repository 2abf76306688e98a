"""Functional NN extras.

Equivalents of the reference's ``pn2_utils/nn/functional.py``:
  * pairwise distances live in ops/distances.py (bpdist2/pdist2);
  * ``smooth_cross_entropy`` / ``encode_one_hot`` (:75-114) here — unused in
    the reference training path but part of the public surface.
Plus the SmoothL1/CE used by the losses, re-exported for library users.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from regnet_for_3d_grasping_tpu.train.losses import (  # noqa: F401
    cross_entropy,
    smooth_l1,
)


def encode_one_hot(target: jax.Array, num_classes: int) -> jax.Array:
    """int labels [...,] -> one-hot [..., C] (functional.py:75-88)."""
    return jax.nn.one_hot(target, num_classes)


def smooth_cross_entropy(logits: jax.Array, target: jax.Array,
                         label_smoothing: float = 0.0) -> jax.Array:
    """Label-smoothing cross entropy, mean-reduced (functional.py:91-114)."""
    num_classes = logits.shape[-1]
    one_hot = encode_one_hot(target, num_classes)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) \
            + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(one_hot * logp, axis=-1))
