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

import jax
import jax.numpy as jnp
from jax import lax


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
