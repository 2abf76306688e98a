"""Index gathers for point grouping.

Replaces three reference ops with plain XLA gathers (autodiff supplies the
backward scatter-adds that the reference hand-writes with atomicAdd):

  * ``gather_points``  — ``function.py:11-26``
  * ``group_points``   — ``csrc/grouping_kernel.cu:29-149`` + wrapper
    ``function.py:84-110``
  * ``gather_knn``     — ``functions/csrc/gather_knn_kernel.cu`` (dgcnn_ext);
    identical gather semantics, so ``group_points`` covers it.

Layout note: this framework is channels-LAST ([B, N, C]) throughout — the
feature axis maps onto TPU lanes — whereas the torch reference is [B, C, N].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(points: jax.Array, index: jax.Array) -> jax.Array:
    """Gather per-point rows: points [B, N, C], index [B, S] -> [B, S, C]."""
    return jnp.take_along_axis(points, index[..., None], axis=1)


def group_points(points: jax.Array, index: jax.Array) -> jax.Array:
    """Gather neighbourhood rows.

    Args:
      points: [B, N, C] per-point features/coords.
      index: [B, S, K] int indices into N.

    Returns:
      [B, S, K, C] grouped rows.
    """
    B, N, C = points.shape
    _, S, K = index.shape
    flat = jnp.take_along_axis(
        points, index.reshape(B, S * K, 1), axis=1)
    return flat.reshape(B, S, K, C)
