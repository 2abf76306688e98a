"""Pallas TPU kernel for the bucketed ball query.

Fuses distance computation, the radius mask and the per-bucket first-hit
selection of ops/ball_query.py's bucket method into one VMEM-resident
program.  Auto-dispatched on TPU above the work threshold in
ops/ball_query.py (1.7x vs the XLA bucket path at the SA1 shape,
tools/ab_kernels.py 2026-08-16).  version=1 computes exact diff-square
distances, so boundary membership can differ from the expansion-form
bpdist2 by f32 rounding (the kernel is the more accurate of the two);
version=2 moves the distance cross term to the MXU (expansion form, f32
HIGHEST — same accuracy class as the XLA path's bpdist2) and folds the
per-centroid norm into the radius threshold, roughly halving the
per-pair VPU work — but measured 3.2x SLOWER on chip (v5e 2026-08-17):
Mosaic pays transpose/padding layout moves to feed [TM,3]x[3,L] matmuls
(contraction dim 3 vs the 8-sublane tile) that dwarf the VPU savings.
Kept as a documented negative result; version=1 is the dispatch.

Grid: (B, centroid tiles, bucket groups of 8), innermost last; each cell
scores 8 [128-centroid x L-point] blocks and emits those buckets' winners.
Running per-centroid hit counts and the first-hit fallback (CUDA pad
semantics, ball_query_kernel.cu:62-69) accumulate in scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128    # centroids per tile


_G = 8       # buckets handled per grid cell (output tile sublane dim)


def _bq_kernel(r2: float, n_valid: int, L: int, x_ref, c_ref, idx_out,
               cnt_out, first_out, cnt_acc, first_acc):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    for g in range(_G):
        # transposed layout: points on SUBLANES, centroids on lanes —
        # the min/sum reductions lower to elementwise trees instead of
        # cross-lane shuffle cascades (~2x the kernel)
        d2 = None
        for c in range(3):
            xg = x_ref[g * L:(g + 1) * L, c:c + 1]           # [L, 1]
            diff = xg - c_ref[c, :][None, :]                 # [L, TM]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        col_base = (k * _G + g) * L
        cols = lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        mask = (d2 < r2) & (col_base + cols < n_valid)

        # first in-radius point of this bucket (ascending index)
        best_col = jnp.min(jnp.where(mask, cols, L), axis=0)  # [TM]
        bucket_valid = best_col < L
        win = col_base + jnp.minimum(best_col, L - 1)

        idx_out[g, :] = jnp.where(bucket_valid, win, -1)
        cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(mask, axis=0,
                                                dtype=jnp.int32)
        first_acc[0, :] = jnp.where((first_acc[0, :] < 0) & bucket_valid,
                                    win, first_acc[0, :])

    @pl.when(k == n_k - 1)
    def _():
        cnt_out[0, :] = cnt_acc[0, :]
        first_out[0, :] = first_acc[0, :]


def _bq_kernel_v2(r2: float, n_valid: int, L: int, x_ref, c_ref, idx_out,
                  cnt_out, first_out, cnt_acc, first_acc):
    """Membership test ``|x-c|^2 < r^2`` rewritten as
    ``|x|^2 - 2 c.x < r^2 - |c|^2``: the cross term rides the MXU and the
    centroid norm shifts the per-row threshold ONCE instead of entering
    every pair — ~half the VPU passes of the diff-square kernel.
    Padded points/centroids sit at 1e10 so their norms exceed any
    threshold and they never match."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        cnt_acc[:] = jnp.zeros(cnt_acc.shape, jnp.int32)
        first_acc[:] = jnp.full(first_acc.shape, -1, jnp.int32)

    thresh = (r2 - (jnp.square(c_ref[0, :]) + jnp.square(c_ref[1, :])
                    + jnp.square(c_ref[2, :])))[None, :]       # [1, TM]
    for g in range(_G):
        xg = x_ref[g * L:(g + 1) * L, :]                       # [L, 3]
        xn = (jnp.square(xg[:, 0]) + jnp.square(xg[:, 1])
              + jnp.square(xg[:, 2]))                          # [L]
        cx = lax.dot_general(xg, c_ref[...],
                             (((1,), (0,)), ((), ())),
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)  # [L, TM]
        col_base = (k * _G + g) * L
        cols = lax.broadcasted_iota(jnp.int32, cx.shape, 0)
        mask = ((xn[:, None] - 2.0 * cx < thresh)
                & (col_base + cols < n_valid))

        best_col = jnp.min(jnp.where(mask, cols, L), axis=0)   # [TM]
        bucket_valid = best_col < L
        win = col_base + jnp.minimum(best_col, L - 1)

        idx_out[g, :] = jnp.where(bucket_valid, win, -1)
        cnt_acc[0, :] = cnt_acc[0, :] + jnp.sum(mask, axis=0,
                                                dtype=jnp.int32)
        first_acc[0, :] = jnp.where((first_acc[0, :] < 0) & bucket_valid,
                                    win, first_acc[0, :])

    @pl.when(k == n_k - 1)
    def _():
        cnt_out[0, :] = cnt_acc[0, :]
        first_out[0, :] = first_acc[0, :]


@functools.partial(jax.jit, static_argnames=("radius", "num_neighbours",
                                             "version", "interpret"))
def ball_query_pallas(xyz: jax.Array, centers: jax.Array, radius: float,
                      num_neighbours: int, version: int = 1,
                      interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Bucketed ball query (see ops/ball_query.py) as a fused kernel.

    xyz [B, N, 3], centers [B, M, 3] -> (index [B, M, K], count [B, M]).
    The K output slots are K buckets of stride L = ceil(N/K) rounded up
    to a 128-lane multiple; the cloud is padded with far points to K*L.
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = num_neighbours
    assert K % _G == 0, K
    L = max(128, -(-(-(-N // K)) // 128) * 128)
    npad = K * L - N
    mpad = (-M) % _TM
    x = xyz.astype(jnp.float32)                        # [B, N, 3]
    c = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)
    if npad:
        x = jnp.pad(x, ((0, 0), (0, npad), (0, 0)), constant_values=1e10)
    if mpad:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, mpad)), constant_values=1e10)
    Mp = M + mpad

    kernel = _bq_kernel if version == 1 else _bq_kernel_v2
    idx, cnt, first = pl.pallas_call(
        functools.partial(kernel, float(radius) ** 2, N, L),
        grid=(B, Mp // _TM, K // _G),
        in_specs=[
            pl.BlockSpec((None, _G * L, 3), lambda b, mt, k: (b, k, 0),
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
    )(x, c)

    idx = jnp.swapaxes(idx, 1, 2)[:, :M]          # [B, M, K]
    cnt = cnt[:, 0, :M]
    first = jnp.maximum(first[:, 0, :M], 0)
    idx = jnp.where(idx >= 0, idx, first[..., None])
    return idx.astype(jnp.int32), jnp.minimum(cnt, K).astype(jnp.int32)
