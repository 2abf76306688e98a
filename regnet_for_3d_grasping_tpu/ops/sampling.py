"""Static-shape random subset selection under a validity mask.

The reference performs many `np.random.choice(valid_set, k, replace=...)`
calls inside its training loop (region grouping `get_regiondataset.py:330-341`,
closing-region crop `gripper_region_network.py:532-544`, balanced sampling).
Those are dynamic-shape host ops.  This module provides the XLA-friendly
equivalent: per-row uniform noise + top-k gives a uniform random subset
without replacement; rows with fewer valid entries than k wrap around their
(shuffled) valid set, mirroring the reference's replace=True fallback.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def hash_uniform(key: jax.Array, shape: tuple) -> jax.Array:
    """Cheap counter-hash uniforms in [0, 1) for selection tie-breaks.

    Threefry uniforms cost ~3.5ms for a [4000, 25600] draw on v5e; bucket
    tie-breaking only needs decorrelated scores, so a lowbias32-style
    integer mix of (seed + linear index) suffices at ~1/4 the cost.
    NOT a substitute for jax.random where statistical quality matters.
    """
    data = jax.random.key_data(key).astype(jnp.uint32)
    seed = data.reshape(-1)[-1]
    n = math.prod(shape)
    idx = lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    x = idx * jnp.uint32(2654435761) + seed * jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x45D9F3B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x45D9F3B)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def bucket_stride(n: int, k: int) -> int:
    """`bucket_choice`'s window width: slot i of a k-slot selection over an
    n-long axis holds an index in [i*stride, (i+1)*stride) or a duplicate
    fill — the contract ops/gather_max.py fuses against."""
    return -(-n // k)


def pallas_bucket_stride(n: int, k: int) -> int:
    """Window width of the fused Pallas selectors (ops/crop_pallas.py,
    ops/group_pallas.py): the bucket length rounded up to a 128-lane
    multiple, min one full lane tile."""
    return max(128, -(-(-(-n // k)) // 128) * 128)


def masked_random_choice(key: jax.Array, mask: jax.Array,
                         k: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample k elements uniformly from the True entries of each mask row.

    Args:
      key: PRNG key.
      mask: [..., N] bool validity.
      k: number of samples per row (static).

    Returns:
      index: [..., k] int32 indices into N.  If a row has >= k valid entries
        this is a uniform k-subset (without replacement); if 0 < count < k the
        shuffled valid entries are cycled; if count == 0 the indices are
        arbitrary and `any_valid` is False.
      any_valid: [...] bool — row had at least one valid entry.
      count: [...] int32 — number of valid entries (uncapped).
    """
    n = mask.shape[-1]
    noise = jax.random.uniform(key, mask.shape, minval=0.5, maxval=1.0)
    score = jnp.where(mask, noise, -1.0)
    top_score, idx = lax.top_k(score, k)          # valid entries first
    idx = idx.astype(jnp.int32)

    count = jnp.sum(mask, axis=-1).astype(jnp.int32)
    any_valid = count > 0
    denom = jnp.maximum(count, 1)[..., None]
    slots = jnp.arange(k, dtype=jnp.int32)
    wrapped = jnp.take_along_axis(idx, slots % denom, axis=-1)
    index = jnp.where(slots < denom, idx, wrapped)
    return index, any_valid, count


def bucket_choice(mask: jax.Array, k: int,
                  score: jax.Array | None = None
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass stratified selection of up to k valid elements per row.

    TPU-fast replacement for ``lax.top_k``-based selection: the N axis is
    split into k buckets and each bucket contributes its best-scoring valid
    element (one fused argmax pass instead of an O(N log N)-ish sort).
    Rows whose bucket has no valid element repeat the row's first valid
    pick — the reference CUDA ball query's pad-with-first-hit semantics
    (ball_query_kernel.cu:62-69).

    Because this framework's point clouds are randomly resampled
    (scoredataset.py:68-75 — index order carries no structure), a stratified
    pick over the index axis is statistically equivalent to the reference's
    uniform `np.random.choice` / first-K-by-index selections, at ~1/20th
    the cost of top_k at these shapes.

    Args:
      mask: [..., N] bool validity.
      k: output slots (static).
      score: optional [..., N] selection preference (higher wins inside a
        bucket); defaults to preferring the smallest index.

    Returns:
      index: [..., k] int32, any_valid: [...] bool, count: [...] int32
      (exact valid count, uncapped — same contract as
      `masked_random_choice`).
    """
    n = mask.shape[-1]
    L = -(-n // k)                     # bucket length
    pad = k * L - n
    if score is None:
        ids = jnp.arange(n, dtype=jnp.float32)
        score = -jnp.broadcast_to(ids, mask.shape)
    if pad:
        mask_p = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
        score_p = jnp.pad(score, [(0, 0)] * (score.ndim - 1) + [(0, pad)])
    else:
        mask_p, score_p = mask, score

    shape = mask_p.shape[:-1] + (k, L)
    m = mask_p.reshape(shape)
    s = jnp.where(m, score_p.reshape(shape), -jnp.inf)
    best = jnp.argmax(s, axis=-1).astype(jnp.int32)        # [..., k]
    base = jnp.arange(k, dtype=jnp.int32) * L
    idx = base + best
    bucket_valid = jnp.any(m, axis=-1)                     # [..., k]

    count = jnp.sum(mask, axis=-1).astype(jnp.int32)
    any_valid = count > 0
    # first valid bucket's pick fills the empty buckets
    first_bucket = jnp.argmax(bucket_valid, axis=-1)
    first_pick = jnp.take_along_axis(
        idx, first_bucket[..., None], axis=-1)
    index = jnp.where(bucket_valid, idx, first_pick)
    index = jnp.minimum(index, n - 1)      # padded tail never selected,
    # but clamp defensively for the all-invalid case
    return index, any_valid, count
