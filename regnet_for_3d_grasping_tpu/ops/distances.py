"""Pairwise squared distances, MXU-friendly.

Equivalent of the reference's ``nn/functional.py:9-68`` (bpdist/bpdist2/pdist2)
using the -2ab + a^2 + b^2 expansion so the cross term runs on the MXU.
All functions are channels-last ([..., N, 3]) unlike the torch originals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Distances feed radius comparisons (ball query, region grouping, GT
# matching); the TPU default matmul precision truncates f32 inputs to
# bfloat16, which flips points near the radius boundary.  Force full f32.
_PRECISION = lax.Precision.HIGHEST


def bpdist(a: jax.Array) -> jax.Array:
    """Batched self pairwise squared distances.

    Single-tensor variant of `bpdist2` (reference ``nn/functional.py:9-26``
    — its baddbmm(alpha=-2) trick is the same -2ab + a^2 + b^2 expansion,
    sharing one square-sum for both operands).  Channels-last:

    Args:
      a: [..., N, C].
    Returns:
      [..., N, N] squared euclidean distances (clamped at 0; the reference
      leaves tiny negative diagonals from cancellation, we clamp like the
      siblings do).
    """
    cross = jnp.einsum("...ic,...jc->...ij", a, a, precision=_PRECISION)
    a2 = jnp.sum(jnp.square(a), axis=-1)
    return jnp.maximum(a2[..., :, None] - 2.0 * cross + a2[..., None, :],
                       0.0)


def pdist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared distances between two point sets.

    Args:
      a: [N1, C], b: [N2, C].
    Returns:
      [N1, N2] squared euclidean distances (clamped at 0).
    """
    cross = jnp.matmul(a, b.T, precision=_PRECISION)
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=-1, keepdims=True)
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


def bpdist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched `pdist2`: a [..., N1, C], b [..., N2, C] -> [..., N1, N2]."""
    cross = jnp.einsum("...ic,...jc->...ij", a, b, precision=_PRECISION)
    a2 = jnp.sum(jnp.square(a), axis=-1)[..., :, None]
    b2 = jnp.sum(jnp.square(b), axis=-1)[..., None, :]
    return jnp.maximum(a2 - 2.0 * cross + b2, 0.0)
