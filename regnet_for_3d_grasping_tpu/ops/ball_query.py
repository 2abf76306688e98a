"""Radius neighbourhood query with fixed output shape.

TPU-native equivalent of the reference CUDA ball query
(``csrc/ball_query_kernel.cu:31-131``): for each centroid, return the first
K points (in index order) whose squared distance is < radius^2, padding short
rows by repeating the first hit.

The CUDA kernel streams points one thread-block per centroid.  Here the point
axis is processed in chunks (keeping peak memory at B*M*chunk instead of
B*M*N) and "first K by index" is expressed as a top-k over the score
``-index`` restricted to in-radius points; per-chunk winners are merged with
a final top-k.  Everything is branch-free and statically shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.ops.distances import bpdist2

_NEG = jnp.float32(-3e38)


def ball_query(
    xyz: jax.Array,
    centers: jax.Array,
    radius: float,
    num_neighbours: int,
    chunk: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Find up to `num_neighbours` points within `radius` of each center.

    Args:
      xyz: [B, N, 3] points.
      centers: [B, M, 3] query centroids.
      radius: ball radius (euclidean).
      num_neighbours: K, static.
      chunk: point-axis chunk size (memory/VMEM knob).

    Returns:
      index: [B, M, K] int32 — first K in-radius point indices (ascending),
        short rows padded with the row's first hit (index 0 if no hit at all).
      count: [B, M] int32 — number of valid (non-padded) neighbours, <= K.
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = num_neighbours
    r2 = jnp.float32(radius * radius)
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)

    chunk = min(chunk, N)
    if N % chunk != 0:
        # pad the point axis; padded points sit at +inf so they never match
        pad = chunk - N % chunk
        xyz = jnp.concatenate(
            [xyz, jnp.full((B, pad, 3), 1e10, xyz.dtype)], axis=1)
        N_pad = N + pad
    else:
        N_pad = N
    n_chunks = N_pad // chunk

    # [n_chunks, B, chunk, 3]
    xyz_chunks = jnp.moveaxis(
        xyz.reshape(B, n_chunks, chunk, 3), 1, 0)
    base_ids = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def per_chunk(args):
        pts, base = args
        d2 = bpdist2(centers, pts)                       # [B, M, chunk]
        ids = base + jnp.arange(chunk, dtype=jnp.int32)  # [chunk]
        # smaller index -> larger score; out-of-radius -> -inf sentinel
        score = jnp.where(d2 < r2, -ids.astype(jnp.float32), _NEG)
        k = min(K, chunk)
        top_score, top_pos = lax.top_k(score, k)         # [B, M, k]
        top_ids = base + top_pos.astype(jnp.int32)
        if k < K:
            top_score = jnp.pad(top_score, ((0, 0), (0, 0), (0, K - k)),
                                constant_values=_NEG)
            top_ids = jnp.pad(top_ids, ((0, 0), (0, 0), (0, K - k)))
        return top_score, top_ids

    # [n_chunks, B, M, K]
    cand_score, cand_ids = lax.map(per_chunk, (xyz_chunks, base_ids))
    cand_score = jnp.moveaxis(cand_score, 0, 2).reshape(B, M, n_chunks * K)
    cand_ids = jnp.moveaxis(cand_ids, 0, 2).reshape(B, M, n_chunks * K)

    top_score, top_pos = lax.top_k(cand_score, K)        # [B, M, K]
    index = jnp.take_along_axis(cand_ids, top_pos, axis=-1)
    valid = top_score > _NEG
    count = jnp.sum(valid, axis=-1).astype(jnp.int32)

    # pad short rows with the first hit (ball_query_kernel.cu:62-69)
    first = jnp.where(count[..., None] > 0, index[..., :1], 0)
    index = jnp.where(valid, index, first)
    return index.astype(jnp.int32), count
