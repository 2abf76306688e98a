"""Radius neighbourhood query with fixed output shape.

TPU-native equivalent of the reference CUDA ball query
(``csrc/ball_query_kernel.cu:31-131``): for each centroid, K points within
radius, short rows padded by repeating the first hit.

Two methods:

  * ``bucket`` (default, fast): stratified one-pass selection
    (ops/sampling.bucket_choice) — the point axis is split into K buckets
    and each bucket yields its smallest in-radius index.  Statistically
    equivalent to the CUDA first-K-by-index semantics because the cloud's
    index order is random (the dataset resamples every cloud,
    scoredataset.py:68-75), and ~10-20x faster than a top_k at these
    shapes.  Chunked over centroids to bound the [M, N] workspace.
  * ``exact``: bit-faithful first-K-in-index-order via chunked masked
    top-k — used by the parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.ops.distances import bpdist2
from regnet_for_3d_grasping_tpu.ops.sampling import bucket_choice

_NEG = jnp.float32(-3e38)


def ball_query(
    xyz: jax.Array,
    centers: jax.Array,
    radius: float,
    num_neighbours: int,
    chunk: int = 4096,
    method: str = "bucket",
) -> tuple[jax.Array, jax.Array]:
    """Find up to `num_neighbours` points within `radius` of each center.

    Args:
      xyz: [B, N, 3] points.
      centers: [B, M, 3] query centroids.
      radius: ball radius (euclidean).
      num_neighbours: K, static.
      chunk: chunk size (point axis for "exact", centroid axis for
        "bucket").
      method: "bucket" (fast, stratified) or "exact" (CUDA-order parity).

    Returns:
      index: [B, M, K] int32 in-radius point indices, short rows padded
        with the row's first hit (0 if no hit at all).
      count: [B, M] int32 valid neighbour count, capped at K.
    """
    if method == "exact":
        return _ball_query_exact(xyz, centers, radius, num_neighbours,
                                 chunk)
    M, N = centers.shape[1], xyz.shape[1]
    if _use_pallas_bq(M, N, num_neighbours):
        from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
            ball_query_pallas)
        return ball_query_pallas(xyz.astype(jnp.float32),
                                 centers.astype(jnp.float32),
                                 float(radius), num_neighbours)
    return _ball_query_bucket(xyz, centers, radius, num_neighbours, chunk)


# Above this M*N work the fused Pallas kernel (ops/ball_query_pallas.py)
# dispatches on TPU.  Set from tools/ab_kernels.py on the v5e chip
# (2026-08-16): at the SA1 shape (M=5120, N=25600, 131M) Pallas wins
# 1.7x (4.43 vs 7.74 ms); at SA2 (M=1024, N=5120, 5.2M) it loses
# (3.32 vs 2.79 ms) — the fused kernel's fixed VMEM-fill cost only
# amortizes on big tiles -> gate at 32M.
_PALLAS_BQ_THRESHOLD: int | None = 1 << 25


def _use_pallas_bq(m: int, n: int, k: int) -> bool:
    if _PALLAS_BQ_THRESHOLD is None or m * n < _PALLAS_BQ_THRESHOLD \
            or k % 8 != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _ball_query_bucket(xyz, centers, radius, K, chunk):
    B, N, _ = xyz.shape
    M = centers.shape[1]
    r2 = jnp.float32(radius * radius)
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)

    chunk = min(chunk, M)
    pad = (-M) % chunk
    if pad:
        centers = jnp.concatenate(
            [centers, jnp.full((B, pad, 3), 1e10, centers.dtype)], axis=1)
    n_chunks = centers.shape[1] // chunk
    c_chunks = jnp.moveaxis(centers.reshape(B, n_chunks, chunk, 3), 1, 0)

    def per_chunk(c):
        d2 = bpdist2(c, xyz)                      # [B, chunk, N]
        mask = d2 < r2
        idx, any_valid, count = bucket_choice(mask, K)
        idx = jnp.where(any_valid[..., None], idx, 0)
        return idx, jnp.minimum(count, K)

    idx, count = lax.map(per_chunk, c_chunks)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, -1, K)[:, :M]
    count = jnp.moveaxis(count, 0, 1).reshape(B, -1)[:, :M]
    return idx.astype(jnp.int32), count.astype(jnp.int32)


def _ball_query_exact(xyz, centers, radius, K, chunk):
    B, N, _ = xyz.shape
    M = centers.shape[1]
    r2 = jnp.float32(radius * radius)
    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)

    chunk = min(chunk, N)
    if N % chunk != 0:
        pad = chunk - N % chunk
        xyz = jnp.concatenate(
            [xyz, jnp.full((B, pad, 3), 1e10, xyz.dtype)], axis=1)
        N_pad = N + pad
    else:
        N_pad = N
    n_chunks = N_pad // chunk

    xyz_chunks = jnp.moveaxis(xyz.reshape(B, n_chunks, chunk, 3), 1, 0)
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
