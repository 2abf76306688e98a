"""k-nearest-neighbour search and inverse-distance feature interpolation.

Replaces the reference's ``point_search`` / ``interpolate_forward`` /
``interpolate_backward`` CUDA kernels (``csrc/interpolate_kernel.cu``).
The CUDA 3-NN kernel brute-forces squared distances with an insertion sort;
here it's a ``lax.top_k`` over the (chunked) distance matrix.  The backward
pass of interpolation is XLA autodiff (deterministic), replacing the
hand-written atomicAdd kernel (interpolate_kernel.cu:279).

Distances are SQUARED, matching the CUDA kernel — the interpolation weights
downstream are inverse squared distances (``modules.py:117-122``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.ops.distances import bpdist2
from regnet_for_3d_grasping_tpu.ops.grouping import group_points


def three_nn(query: jax.Array, key: jax.Array, k: int = 3,
             chunk: int = 8192) -> tuple[jax.Array, jax.Array]:
    """For each query point, its k nearest key points.

    Args:
      query: [B, N1, 3], key: [B, N2, 3].
      k: number of neighbours (static; 3 in the reference, kernel-hardcoded
         at interpolate_kernel.cu:21).
      chunk: query-axis chunk size to bound the [N1, N2] matrix.

    Returns:
      index: [B, N1, k] int32, distance: [B, N1, k] squared distances,
      ascending.
    """
    B, N1, _ = query.shape
    N2 = key.shape[1]
    query = query.astype(jnp.float32)
    key = key.astype(jnp.float32)

    # big k=3 problems route to the VMEM-resident Pallas kernel on TPU
    if k == 3 and N1 * N2 >= (1 << 24):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            from regnet_for_3d_grasping_tpu.ops.knn_pallas import (
                three_nn_pallas)
            return three_nn_pallas(query, key)

    def solve(q):
        d2 = bpdist2(q, key)                     # [B, n, N2]
        if k <= 4:
            # unrolled argmin extraction: k fused VPU passes beat TPU
            # top_k's sort-based lowering by ~10x at these shapes
            ids = lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
            out_i, out_d = [], []
            for _ in range(k):
                i = jnp.argmin(d2, axis=-1)
                v = jnp.take_along_axis(d2, i[..., None], axis=-1)[..., 0]
                out_i.append(i.astype(jnp.int32))
                out_d.append(v)
                d2 = jnp.where(ids == i[..., None], jnp.inf, d2)
            return (jnp.stack(out_i, axis=-1), jnp.stack(out_d, axis=-1))
        neg, idx = lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    if N1 <= chunk:
        return solve(query)

    if N1 % chunk != 0:
        pad = chunk - N1 % chunk
        query = jnp.concatenate(
            [query, jnp.zeros((B, pad, 3), query.dtype)], axis=1)
    n_chunks = query.shape[1] // chunk
    q_chunks = jnp.moveaxis(query.reshape(B, n_chunks, chunk, 3), 1, 0)
    idx, d2 = lax.map(solve, q_chunks)           # [n_chunks, B, chunk, k]
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, n_chunks * chunk, k)[:, :N1]
    d2 = jnp.moveaxis(d2, 0, 1).reshape(B, n_chunks * chunk, k)[:, :N1]
    return idx, d2


def three_interpolate(feature: jax.Array, index: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted k-NN feature gather.

    Args:
      feature: [B, N2, C] key features.
      index: [B, N1, k] neighbour indices.
      weight: [B, N1, k] interpolation weights (rows sum to 1).

    Returns:
      [B, N1, C] interpolated features.
    """
    gathered = group_points(feature, index)       # [B, N1, k, C]
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(distance: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Inverse-(squared-)distance weights, normalized (modules.py:117-122)."""
    inv = 1.0 / jnp.maximum(distance, eps)
    return inv / jnp.sum(inv, axis=-1, keepdims=True)
