"""Pallas TPU kernel for 3-nearest-neighbour search.

The XLA three_nn (ops/knn.py) materializes the [N1, N2] distance matrix in
HBM and re-reads it for each of the k argmin extractions (~2GB of traffic
at the FP3 shapes).  This kernel keeps everything in VMEM: the grid walks
(query tiles x key chunks) with the key chunk innermost, maintaining each
query row's running top-3 (distance, index) in scratch and merging the
chunk's top-3 candidates each step.  Distances are squared, matching the
CUDA kernel (interpolate_kernel.cu) and ops/knn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128     # query rows per tile
_L = 512      # key columns per chunk
_INF = 3e38   # plain float — a jnp scalar would be a captured constant


def _extract_top3(d2, col_base):
    """d2 [L, TM] (keys on SUBLANES, queries on lanes) -> the 3 smallest
    per query as (dists [3, TM], ids [3, TM]).  Sublane-axis reductions
    lower to elementwise trees, not cross-lane shuffle cascades — the
    layout choice is worth ~2x on the whole kernel."""
    L, TM = d2.shape
    cols = lax.broadcasted_iota(jnp.int32, (L, TM), 0)
    outs_d, outs_i = [], []
    for _ in range(3):
        m = jnp.min(d2, axis=0)
        am = jnp.min(jnp.where(d2 == m[None, :], cols, L), axis=0)
        outs_d.append(m)
        outs_i.append(col_base + am)
        d2 = jnp.where(cols == am[None, :], _INF, d2)
    return (jnp.stack(outs_d, axis=0), jnp.stack(outs_i, axis=0))


def _knn_kernel(n_valid_keys: int, q_ref, k_ref, d_out, i_out,
                best_d, best_i):
    """q [3, TM], k [L, 3] blocks; scratches best_d/best_i [3, TM]."""
    s = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        best_d[:] = jnp.full(best_d.shape, _INF, jnp.float32)
        best_i[:] = jnp.zeros(best_i.shape, jnp.int32)

    d2 = None
    for c in range(3):
        diff = k_ref[:, c:c + 1] - q_ref[c, :][None, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    # mask out key-axis padding (global id >= n_valid_keys)
    col_base = s * _L
    cols = col_base + lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    d2 = jnp.where(cols < n_valid_keys, d2, _INF)

    cd, ci = _extract_top3(d2, col_base)              # [3, TM]
    # merge with the running top-3: 6 candidates per query -> new top-3
    alld = jnp.concatenate([best_d[:3], cd], axis=0)      # [6, TM]
    alli = jnp.concatenate([best_i[:3], ci], axis=0)
    slot = lax.broadcasted_iota(jnp.int32, alld.shape, 0)
    nd, ni = [], []
    for _ in range(3):
        m = jnp.min(alld, axis=0)
        am = jnp.min(jnp.where(alld == m[None, :], slot, 6), axis=0)
        nd.append(m)
        ni.append(jnp.sum(jnp.where(slot == am[None, :], alli, 0), axis=0))
        alld = jnp.where(slot == am[None, :], _INF, alld)
    best_d[:, :] = jnp.stack(nd, axis=0)
    best_i[:, :] = jnp.stack(ni, axis=0).astype(jnp.int32)

    @pl.when(s == n_s - 1)
    def _():
        d_out[...] = best_d[...]
        i_out[...] = best_i[...]


def _knn_kernel_v2(n_valid_keys: int, q_ref, k_ref, d_out, i_out,
                   best_d, best_i):
    """Expansion-form distances with the cross term on the MXU.

    The v1 kernel's per-pair diff-square costs ~9 VPU ops; here
    ``d2 - |q|^2 = |k|^2 - 2 q.k`` runs as one [TM,3]x[3,L] matmul
    (f32 HIGHEST — the TPU default would truncate to bf16 and flip
    near-tie neighbour picks) plus two cheap passes.  The per-row
    constant |q|^2 cannot change each row's top-3 *order*, so it is
    added once to the three winners at the end instead of to all
    [TM, L] candidates — the returned distances are full squared
    distances, matching ops/knn.py's bpdist2 expansion form.

    Measured 1.25x SLOWER than v1 on chip (v5e 2026-08-17): the MXU
    matmul's contraction dim of 3 forces Mosaic layout moves that cost
    more than the saved VPU passes (same finding, amplified, for the
    ball-query v2 kernel).  Documented negative result; v1 dispatches.
    """
    s = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        best_d[:] = jnp.full(best_d.shape, _INF, jnp.float32)
        best_i[:] = jnp.zeros(best_i.shape, jnp.int32)

    kn = (jnp.square(k_ref[:, 0]) + jnp.square(k_ref[:, 1])
          + jnp.square(k_ref[:, 2]))                       # [L]
    qk = lax.dot_general(k_ref[...], q_ref[...],
                         (((1,), (0,)), ((), ())),
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # [L, TM]
    d2 = kn[:, None] - 2.0 * qk
    col_base = s * _L
    cols = col_base + lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    d2 = jnp.where(cols < n_valid_keys, d2, _INF)

    cd, ci = _extract_top3(d2, col_base)
    alld = jnp.concatenate([best_d[:3], cd], axis=0)
    alli = jnp.concatenate([best_i[:3], ci], axis=0)
    slot = lax.broadcasted_iota(jnp.int32, alld.shape, 0)
    nd, ni = [], []
    for _ in range(3):
        m = jnp.min(alld, axis=0)
        am = jnp.min(jnp.where(alld == m[None, :], slot, 6), axis=0)
        nd.append(m)
        ni.append(jnp.sum(jnp.where(slot == am[None, :], alli, 0), axis=0))
        alld = jnp.where(slot == am[None, :], _INF, alld)
    best_d[:, :] = jnp.stack(nd, axis=0)
    best_i[:, :] = jnp.stack(ni, axis=0).astype(jnp.int32)

    @pl.when(s == n_s - 1)
    def _():
        qn = (jnp.square(q_ref[0, :]) + jnp.square(q_ref[1, :])
              + jnp.square(q_ref[2, :]))                   # [TM]
        d_out[...] = best_d[...] + qn[None, :]
        i_out[...] = best_i[...]


@functools.partial(jax.jit, static_argnames=("version", "interpret"))
def three_nn_pallas(query: jax.Array, key: jax.Array,
                    version: int = 1,
                    interpret: bool = False
                    ) -> tuple[jax.Array, jax.Array]:
    """query [B, N1, 3], key [B, N2, 3] -> (idx [B, N1, 3], d2 [B, N1, 3]).

    Results match ops/knn.three_nn (ascending squared distances; ties
    resolved to the smallest key index).  version=2 computes the distance
    cross term on the MXU (expansion form, like the XLA path's bpdist2);
    version=1 keeps the diff-square VPU form.
    """
    B, N1, _ = query.shape
    N2 = key.shape[1]
    qpad = (-N1) % _TM
    kpad = (-N2) % _L
    q = jnp.swapaxes(query.astype(jnp.float32), 1, 2)   # [B, 3, N1]
    k = key.astype(jnp.float32)                          # [B, N2, 3]
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, qpad)))
    if kpad:
        k = jnp.pad(k, ((0, 0), (0, kpad), (0, 0)), constant_values=1e10)
    N1p, N2p = N1 + qpad, N2 + kpad

    kernel = _knn_kernel if version == 1 else _knn_kernel_v2
    d_out, i_out = pl.pallas_call(
        functools.partial(kernel, N2),
        grid=(B, N1p // _TM, N2p // _L),
        in_specs=[
            pl.BlockSpec((None, 3, _TM), lambda b, qt, s: (b, 0, qt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _L, 3), lambda b, qt, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 3, _TM), lambda b, qt, s: (b, 0, qt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, _TM), lambda b, qt, s: (b, 0, qt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, N1p), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((3, _TM), jnp.float32),
                        pltpu.VMEM((3, _TM), jnp.int32)],
        interpret=interpret,
    )(q, k)
    return (jnp.swapaxes(i_out, 1, 2)[:, :N1],
            jnp.swapaxes(d_out, 1, 2)[:, :N1])
