"""Point-cloud preprocessing ops from the evaluator's PointCloud wrapper.

Equivalents of ``eval_utils/pointcloud.py:13-25`` (open3d
``remove_radius_outlier`` and ``voxel_down_sample``).  The reference defines
them on its PointCloud base class (they are not called in the main eval
path, but are part of the public surface).  Fixed-shape, mask-returning
versions: callers keep their arrays and apply the boolean mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.ops.distances import bpdist2


def radius_outlier_mask(points: jax.Array, nb_points: int = 16,
                        radius: float = 0.04,
                        chunk: int = 4096) -> jax.Array:
    """True for points with >= nb_points neighbours within radius
    (open3d remove_radius_outlier semantics; the point itself counts)."""
    points = points.astype(jnp.float32)
    N = points.shape[0]
    r2 = jnp.float32(radius * radius)

    pad = (-N) % chunk
    padded = jnp.concatenate(
        [points, jnp.full((pad, 3), 1e10, points.dtype)]) if pad \
        else points
    chunks = padded.reshape(-1, chunk, 3)

    def per_chunk(q):
        d2 = bpdist2(q[None], points[None])[0]
        return jnp.sum(d2 <= r2, axis=-1)

    counts = lax.map(per_chunk, chunks).reshape(-1)[:N]
    return counts >= nb_points


def voxel_downsample_mask(points: jax.Array, voxel_size: float = 0.005,
                          table_size: int = 1 << 20) -> jax.Array:
    """True for one representative point per occupied voxel.

    open3d's voxel_down_sample averages points per voxel (dynamic output);
    the fixed-shape equivalent keeps the lowest-index point of each voxel.
    Voxels are identified through a hash table of `table_size` slots —
    two distinct voxels colliding merge (keep one representative), with
    collision probability ~ occupied_voxels / table_size.
    """
    points = points.astype(jnp.float32)
    N = points.shape[0]
    v = jnp.floor(points / voxel_size).astype(jnp.int32)
    # 3-axis integer hash (large odd constants, xor-mixed)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    h = (h % table_size + table_size) % table_size

    idx = jnp.arange(N, dtype=jnp.int32)
    table = jnp.full((table_size,), N, jnp.int32)
    table = table.at[h].min(idx)        # lowest index per slot
    return table[h] == idx
