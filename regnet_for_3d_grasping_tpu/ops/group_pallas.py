"""Pallas TPU kernel for proposal-region grouping (radius + random pick).

The geometry/region.group_regions XLA path materializes a [chunk, N]
squared-distance matrix, a same-shape counter-hash noise field and the
bucket-selection workspace per center chunk (~1.3 GB of HBM traffic at
the 4000-center inference preset).  This kernel fuses distance, radius
mask, in-kernel counter-hash noise and the per-bucket argmax so nothing
bigger than a [128, L] tile is ever materialized.

Same selection contract as ops/sampling.bucket_choice with a random
score (stratified uniform pick; empty buckets repeat the first non-empty
bucket's winner; `count` is the exact in-radius population).  Distances
are exact diff-squares, which can flip radius-boundary membership vs the
expansion-form bpdist2 by one f32 ulp (the kernel is the more accurate
of the two — same caveat as ops/ball_query_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128    # centers per tile
_G = 8       # buckets per grid cell


def _group_kernel(r2: float, n_valid: int, L: int, seed_ref,
                  x_ref, c_ref, idx_out, cnt_out, first_out,
                  cnt_acc, first_acc):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    seed = seed_ref[0]
    mrow = pl.program_id(1) * _TM
    rows = lax.broadcasted_iota(jnp.int32, (_TM, L), 0) + mrow

    for g in range(_G):
        col_base = (k * _G + g) * L
        d2 = None
        for c in range(3):
            xg = x_ref[c, g * L:(g + 1) * L]
            diff = c_ref[c, :][:, None] - xg[None, :]          # [TM, L]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        cols = lax.broadcasted_iota(jnp.int32, (_TM, L), 1)
        mask = (d2 <= r2) & (col_base + cols < n_valid)

        h = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
             + (col_base + cols).astype(jnp.uint32)
             * jnp.uint32(2654435761) + seed.astype(jnp.uint32))
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x45D9F3B)
        h = h ^ (h >> 16)
        # Mosaic can't lower uint32->f32; the top 23 hash bits fit int32
        # losslessly and are plenty of tiebreak entropy.
        h23 = (h >> 9).astype(jnp.int32)
        noise = h23.astype(jnp.float32) * jnp.float32(1.0 / 8388608.0)
        val = jnp.where(mask, noise + 1.0, 0.0)

        best = jnp.max(val, axis=1)
        win_col = jnp.argmax(val, axis=1).astype(jnp.int32)
        bucket_valid = best > 0.0
        win = col_base + win_col

        idx_out[g, :] = jnp.where(bucket_valid, win, -1)
        cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(mask, axis=1,
                                                dtype=jnp.int32)
        first_acc[0, :] = jnp.where((first_acc[0, :] < 0) & bucket_valid,
                                    win, first_acc[0, :])

    @pl.when(k == n_k - 1)
    def _():
        cnt_out[0, :] = cnt_acc[0, :]
        first_out[0, :] = first_acc[0, :]


@functools.partial(jax.jit, static_argnames=("radius", "group_num",
                                             "interpret"))
def group_regions_pallas(xyz: jax.Array, centers: jax.Array,
                         seed: jax.Array, radius: float, group_num: int,
                         interpret: bool = False
                         ) -> tuple[jax.Array, jax.Array]:
    """Fused radius grouping.

    Args:
      xyz: [B, N, 3] cloud; centers: [B, M, 3]; seed: [] uint32.
      radius: ball radius (static); group_num: K slots (multiple of 8).

    Returns:
      index [B, M, K] int32 (0 where a center has no in-radius point),
      count [B, M] int32 exact in-radius population.
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = group_num
    assert K % _G == 0, K
    L = max(128, -(-(-(-N // K)) // 128) * 128)
    npad = K * L - N
    mpad = (-M) % _TM

    x = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    c = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)
    if npad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, npad)), constant_values=1e10)
    if mpad:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, mpad)), constant_values=1e10)
    Mp = M + mpad
    seed = jnp.asarray(seed, jnp.uint32).reshape(1)

    idx, cnt, first = pl.pallas_call(
        functools.partial(_group_kernel, float(radius) ** 2, N, L),
        grid=(B, Mp // _TM, K // _G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3, _G * L), lambda b, mt, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, _TM), lambda b, mt, k: (b, 0, mt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, _G, _TM), lambda b, mt, k: (b, k, mt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM), lambda b, mt, k: (b, 0, mt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _TM), lambda b, mt, k: (b, 0, mt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, _TM), jnp.int32),
                        pltpu.VMEM((1, _TM), jnp.int32)],
        interpret=interpret,
    )(seed, x, c)

    idx = jnp.swapaxes(idx, 1, 2)[:, :M]
    cnt = cnt[:, 0, :M]
    first = jnp.maximum(first[:, 0, :M], 0)
    idx = jnp.where(idx >= 0, idx, first[..., None])
    return idx.astype(jnp.int32), cnt.astype(jnp.int32)
