"""Pallas TPU kernel for the gripper closing-region crop.

Fuses the dense crop's whole per-proposal pipeline — gripper-frame
transform, box test, random-tiebreak bucket selection and inside-count —
into one VMEM-resident program.  The XLA path
(geometry/region.closing_region_crop_dense) materializes [chunk, N, 3]
local coordinates plus a [chunk, N] noise/mask workspace per proposal
chunk (~2.5 GB of HBM traffic at the 4000-proposal inference preset);
here nothing bigger than a [128, L] tile ever leaves registers/VMEM.

Selection semantics match ops/sampling.bucket_choice with a random
score: the point axis is split into `gripper_num` buckets and each bucket
contributes one uniformly-chosen inside point; empty buckets repeat the
first non-empty bucket's pick (CUDA pad parity, ball_query_kernel.cu:
62-69).  The tiebreak noise is a counter-hash (ops/sampling.hash_uniform
rationale) seeded per call, varying per (proposal, point).

Counts are exact and match the XLA path bit-for-bit on non-degenerate
inputs; the sampled indices are random in both paths (different streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128    # proposals per tile
_G = 8       # buckets per grid cell


def _crop_kernel(box: tuple, n_valid: int, L: int, seed_ref,
                 x_ref, f_ref, c_ref, idx_out, cnt_out, first_out,
                 cnt_acc, first_acc):
    """x_ref [G*L, 3] cloud slab (points on sublanes); f_ref [9, TM]
    row-major 3x3 frames (columns = gripper axes); c_ref [3, TM]."""
    xlo, xhi, yabs, zabs = box
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    seed = seed_ref[0]
    mrow = pl.program_id(1) * _TM
    # transposed layout: points on SUBLANES, proposals on lanes — the
    # max/argmax/sum reductions lower to elementwise trees instead of
    # cross-lane shuffle cascades
    rows = lax.broadcasted_iota(jnp.int32, (L, _TM), 1) + mrow
    iota_l = lax.broadcasted_iota(jnp.int32, (L, _TM), 0)

    for g in range(_G):
        col_base = (k * _G + g) * L
        rel = [x_ref[g * L:(g + 1) * L, c:c + 1]
               - c_ref[c, :][None, :] for c in range(3)]       # 3x [L, TM]
        loc = [f_ref[0 + j, :][None, :] * rel[0]
               + f_ref[3 + j, :][None, :] * rel[1]
               + f_ref[6 + j, :][None, :] * rel[2] for j in range(3)]
        cols = iota_l
        inside = ((loc[0] > xlo) & (loc[0] < xhi)
                  & (jnp.abs(loc[1]) < yabs) & (jnp.abs(loc[2]) < zabs)
                  & (col_base + cols < n_valid))

        # counter-hash noise in [1, 2) per (proposal, point)
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
        val = jnp.where(inside, noise + 1.0, 0.0)

        best = jnp.max(val, axis=0)                            # [TM]
        # first-index argmax as max + min-where (same tie semantics)
        win_col = jnp.min(jnp.where(val == best[None, :], cols,
                                    jnp.int32(2**31 - 1)),
                          axis=0).astype(jnp.int32)
        bucket_valid = best > 0.0
        win = col_base + jnp.minimum(win_col, L - 1)

        idx_out[g, :] = jnp.where(bucket_valid, win, -1)
        cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(inside, axis=0,
                                                dtype=jnp.int32)
        first_acc[0, :] = jnp.where((first_acc[0, :] < 0) & bucket_valid,
                                    win, first_acc[0, :])

    @pl.when(k == n_k - 1)
    def _():
        cnt_out[0, :] = cnt_acc[0, :]
        first_out[0, :] = first_acc[0, :]


@functools.partial(jax.jit, static_argnames=("box", "gripper_num",
                                             "interpret"))
def closing_region_crop_pallas(
        xyz: jax.Array, frames: jax.Array, centers: jax.Array,
        seed: jax.Array, box: tuple, gripper_num: int,
        interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused dense closing-region crop.

    Args:
      xyz: [B, N, 3] cloud.
      frames: [B, M, 3, 3] gripper frames (columns = axes).
      centers: [B, M, 3] grasp bases (frame translations).
      seed: [] uint32/int32 noise seed.
      box: (xlo, xhi, |y|max, |z|max) closing-box bounds, static.
      gripper_num: K output slots (static, multiple of 8).

    Returns:
      index [B, M, K] int32 (0 where a row has no inside point at all),
      count [B, M] int32 exact inside-point count.
    """
    B, N, _ = xyz.shape
    M = frames.shape[1]
    K = gripper_num
    assert K % _G == 0, K
    L = max(128, -(-(-(-N // K)) // 128) * 128)
    npad = K * L - N
    mpad = (-M) % _TM

    x = xyz.astype(jnp.float32)                               # [B, N, 3]
    # frames row-major [B, 9, M]: entry (k*3+j) = F[k][j]
    f = jnp.swapaxes(frames.astype(jnp.float32).reshape(B, M, 9), 1, 2)
    c = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)
    if npad:
        x = jnp.pad(x, ((0, 0), (0, npad), (0, 0)), constant_values=1e10)
    if mpad:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, mpad)))
        c = jnp.pad(c, ((0, 0), (0, 0), (0, mpad)),
                    constant_values=1e10)
    Mp = M + mpad
    seed = jnp.asarray(seed, jnp.uint32).reshape(1)

    idx, cnt, first = pl.pallas_call(
        functools.partial(_crop_kernel, tuple(float(v) for v in box), N,
                          L),
        grid=(B, Mp // _TM, K // _G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, _G * L, 3), lambda b, mt, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 9, _TM), lambda b, mt, k: (b, 0, mt),
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
    )(seed, x, f, c)

    idx = jnp.swapaxes(idx, 1, 2)[:, :M]                      # [B, M, K]
    cnt = cnt[:, 0, :M]
    first = jnp.maximum(first[:, 0, :M], 0)
    idx = jnp.where(idx >= 0, idx, first[..., None])
    return idx.astype(jnp.int32), cnt.astype(jnp.int32)
