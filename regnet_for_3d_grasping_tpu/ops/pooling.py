"""Fused gather + max-pool over bucket-structured point indices.

Both proposal heads consume gathered per-point backbone features ONLY
through a max-pool (reference ``pointnet2.py:165-189`` MaxPool1d over the
group, ``:227-254`` over the closing region), yet the reference — and the
XLA fallback here — first materializes the gathered tensor:
``group_points(feature, index)`` at the 4000-center inference preset is a
[1, 4000, 256, 256] (1.05 GB) intermediate that costs ~5.7 ms of HBM
traffic before the 4 MB pooled result is reduced (grn:389-395 + maxpool).

This op never materializes it.  Every index producer in this framework
(`ops.sampling.bucket_choice`, `ops.crop_pallas`) is *bucket-structured*:
slot ``k`` of a row either holds an index inside its own window
``[k*stride, (k+1)*stride)`` or duplicates another slot's in-window pick
(the CUDA pad-with-first-hit parity, ball_query_kernel.cu:62-69) — and a
max is invariant under duplicates.  So the gather becomes, per bucket, a
one-hot [TS, Wp] x window [Wp, C] matmul on the MXU (exact: each output
row is a single 1.0 x value product), with the running max accumulated in
a VMEM-resident output block.  Out-of-window slots are redirected to a
sentinel row holding -BIG, so they never win.

HBM traffic drops from ~1.6 GB to ~(feature + S x C), and the FLOPs ride
the MXU instead of the gather unit.

Gradient: a custom VJP routes d(pooled) to the first winning row per
(proposal, channel) via a deterministic XLA scatter-add — equivalent to
autodiff through gather+max wherever ties only arise from duplicated
rows (which is the only systematic tie source here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regnet_for_3d_grasping_tpu.ops.grouping import group_points

_TS = 512      # proposal rows per tile
_KC = 8        # buckets per grid step
_BIG = 1e38    # finite sentinel (0 * -inf in the one-hot matmul would NaN)

# Pallas dispatch above this S*K*C work on TPU; None disables.  Set from
# tools/ab_kernels.py on the v5e chip (2026-08-17): at the region shape
# (4000x256x256) the kernel wins 2.1x in f32 / 2.8x in bf16; at the
# refine shape (4000x64x256, Wp=512) bf16 wins 1.6x but f32 TIES — the
# exact 3-way-split matmuls triple the f32 FLOPs on the 512-wide padded
# windows — so the f32 threshold sits above it.
_PALLAS_THRESHOLD_BF16: int | None = 1 << 25
_PALLAS_THRESHOLD_F32: int | None = 1 << 27


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas(s: int, k: int, c: int, stride: int, dtype) -> bool:
    thr = _PALLAS_THRESHOLD_BF16 if dtype == jnp.bfloat16 \
        else _PALLAS_THRESHOLD_F32
    return (thr is not None and stride > 0
            and s * k * c >= thr and k % _KC == 0
            and _on_tpu())


def _windows(feature: jax.Array, K: int, stride: int, Wp: int) -> jax.Array:
    """[B, N, C] -> [B, K, Wp, C] per-bucket windows, sentinel-padded.

    Window k rows [0, stride) hold feature[k*stride + w]; rows
    [stride, Wp) and the beyond-N tail hold -BIG — row `stride` is the
    fill-redirect sentinel, so Wp > stride always.
    """
    B, N, C = feature.shape
    assert Wp > stride
    pad_n = K * stride - N
    assert pad_n >= 0, (N, K, stride)
    f = feature
    if pad_n:
        f = jnp.pad(f, ((0, 0), (0, pad_n), (0, 0)),
                    constant_values=-_BIG)
    f = f.reshape(B, K, stride, C)
    return jnp.pad(f, ((0, 0), (0, 0), (0, Wp - stride), (0, 0)),
                   constant_values=-_BIG)


def _kernel(stride: int, Wp: int, with_argmax: bool,
            idx_ref, fw_ref, out_ref, *rest):
    """Grid (B, S/TS, K/KC), k innermost so the out block stays resident.

    Refs after the leading-None squeeze: idx_ref [KC, TS] (this step's
    bucket chunk, TRANSPOSED so the lane dim is the 128-aligned proposal
    axis — Mosaic requires the last block dim 128-divisible), fw_ref
    [KC, Wp, C] f32/bf16, out_ref [TS, C]; optional win_ref [TS, C]
    int32.  Everything stays in natural layouts: the one-hot is built
    [Wp, TS] and contracted over its sublane dim, and the argmax
    winner's row id comes from a second tiny matmul — no transposes.
    """
    kc = pl.program_id(2)
    win_ref = rest[0] if with_argmax else None
    dtype = out_ref.dtype
    TS = out_ref.shape[0]

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, -_BIG, dtype)
        if with_argmax:
            win_ref[...] = jnp.zeros(win_ref.shape, jnp.int32)

    fw = fw_ref[...]
    if fw.dtype == jnp.float32:
        # exact 3-way bf16 split: f32 has a 24-bit mantissa = 3 x 8-bit
        # bf16 mantissas, so h1+h2+h3 == fw exactly and each one-hot
        # product passes one bf16 term through unchanged
        h1 = fw.astype(jnp.bfloat16)
        r1 = fw - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
        terms = (h1, h2, h3)
    else:
        terms = (fw,)

    iota_w = lax.broadcasted_iota(jnp.int32, (Wp, TS), 0)
    contract0 = (((0,), (0,)), ((), ()))
    for g in range(_KC):
        k_global = kc * _KC + g                   # traced scalar is fine
        row = idx_ref[g:g + 1, :]                           # [1, TS]
        rel = row - k_global * stride
        # out-of-window slots are duplicate fills (see module docstring):
        # redirect them to pad row `stride`, which holds -BIG (Wp is
        # always > stride — _windows pads at least one sentinel row), so
        # they can never win the running max
        rel = jnp.where((rel >= 0) & (rel < stride), rel, stride)
        onehot = (iota_w == rel).astype(jnp.bfloat16)       # [Wp, TS]
        picked = jnp.zeros((TS, fw.shape[-1]), jnp.float32)
        for t in terms:
            picked = picked + lax.dot_general(
                onehot, t[g], dimension_numbers=contract0,
                preferred_element_type=jnp.float32)         # [TS, C]
        picked = picked.astype(dtype)
        if with_argmax:
            # winner's window-relative row, via the same one-hot, in the
            # needed [TS, 1] orientation without a transpose.  The TPU
            # default matmul truncates f32 operands to bf16 (8-bit
            # mantissa — row ids above 256 would get mangled), so the
            # iota is split into two bf16-EXACT integer parts < 256 and
            # recombined after the dots.
            w_iota = lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)
            w_hi = (w_iota // 256).astype(jnp.bfloat16)
            w_lo = (w_iota % 256).astype(jnp.bfloat16)
            hi = lax.dot_general(onehot, w_hi,
                                 dimension_numbers=contract0,
                                 preferred_element_type=jnp.float32)
            lo = lax.dot_general(onehot, w_lo,
                                 dimension_numbers=contract0,
                                 preferred_element_type=jnp.float32)
            rowid = (hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
                     + k_global * stride)                   # [TS, 1]
            prev = out_ref[...]
            upd = picked > prev
            out_ref[...] = jnp.where(upd, picked, prev)
            win_ref[...] = jnp.where(upd, rowid, win_ref[...])
        else:
            out_ref[...] = jnp.maximum(out_ref[...], picked)


@functools.partial(jax.jit, static_argnames=("stride", "with_argmax",
                                             "interpret"))
def gather_max_pallas(feature: jax.Array, index: jax.Array, stride: int,
                      with_argmax: bool = False, interpret: bool = False):
    """Fused max over gathered rows.

    Args:
      feature: [B, N, C] per-point features (f32 or bf16).
      index: [B, S, K] int32, bucket-structured: slot k in
        [k*stride, (k+1)*stride) or a duplicate of another slot's
        in-window value (see module docstring).
      stride: bucket width of the index producer (static);
        K*stride >= N required.
      with_argmax: also return the winning source row per (s, c).

    Returns:
      pooled [B, S, C] (= max_k feature[b, index[b,s,k], c]), and
      win [B, S, C] int32 when with_argmax.
    """
    B, N, C = feature.shape
    _, S, K = index.shape
    assert K % _KC == 0, K
    assert K * stride >= N, (K, stride, N)
    # at least one pad row: row `stride` is the fill-redirect sentinel
    Wp = (stride // 128 + 1) * 128

    fw = _windows(feature, K, stride, Wp)
    pad_s = (-S) % _TS
    idx = index.astype(jnp.int32)
    if pad_s:
        idx = jnp.pad(idx, ((0, 0), (0, pad_s), (0, 0)))
    Sp = S + pad_s
    TS = min(_TS, Sp)
    idx_t = jnp.swapaxes(idx, 1, 2)                   # [B, K, Sp]

    out_shape = [jax.ShapeDtypeStruct((B, Sp, C), feature.dtype)]
    out_specs = [pl.BlockSpec((None, TS, C), lambda b, st, kc: (b, st, 0),
                              memory_space=pltpu.VMEM)]
    if with_argmax:
        out_shape.append(jax.ShapeDtypeStruct((B, Sp, C), jnp.int32))
        out_specs.append(
            pl.BlockSpec((None, TS, C), lambda b, st, kc: (b, st, 0),
                         memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel, stride, Wp, with_argmax),
        grid=(B, Sp // TS, K // _KC),
        in_specs=[
            pl.BlockSpec((None, _KC, TS), lambda b, st, kc: (b, kc, st),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _KC, Wp, C),
                         lambda b, st, kc: (b, kc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(idx_t, fw)

    pooled = res[0][:, :S]
    if with_argmax:
        return pooled, res[1][:, :S]
    return pooled


def _xla_pooled(feature: jax.Array, index: jax.Array) -> jax.Array:
    return jnp.max(group_points(feature, index), axis=-2)


def _xla_pooled_argmax(feature: jax.Array, index: jax.Array):
    gathered = group_points(feature, index)       # [B, S, K, C]
    pooled = jnp.max(gathered, axis=-2)
    am = jnp.argmax(gathered, axis=-2)            # [B, S, C] slot in [0,K)
    win = jnp.take_along_axis(index, am, axis=-1)  # slot -> source row
    return pooled, win


def gather_max(feature: jax.Array, index: jax.Array,
               stride: int = 0) -> jax.Array:
    """max_k feature[b, index[b,s,k], c] without materializing the gather.

    feature [B, N, C], index [B, S, K] -> [B, S, C].

    `stride` is the index producer's bucket width (ops/sampling.
    bucket_choice: ceil(N/K); ops/crop_pallas: its L) — pass 0 when the
    indices are NOT bucket-structured, which forces the XLA path.  On TPU
    at large S*K*C the fused Pallas kernel dispatches; elsewhere the op
    is the plain gather + max (the two agree bitwise, tested in
    tests/test_pallas_interpret.py / test_pallas_kernels.py).
    """
    return _gather_max_impl(feature, index, stride, feature.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_max_impl(feature, index, stride: int, n: int):
    S, K = index.shape[1:]
    C = feature.shape[-1]
    if use_pallas(S, K, C, stride, feature.dtype) and K * stride >= n:
        return gather_max_pallas(feature, index, stride)
    return _xla_pooled(feature, index)


def _gather_max_fwd(feature, index, stride, n):
    S, K = index.shape[1:]
    C = feature.shape[-1]
    if use_pallas(S, K, C, stride, feature.dtype) and K * stride >= n:
        pooled, win = gather_max_pallas(feature, index, stride,
                                        with_argmax=True)
    else:
        pooled, win = _xla_pooled_argmax(feature, index)
    return pooled, win


def _gather_max_bwd(stride, n, win, g):
    # deterministic scatter-add of d(pooled) to each winner row; both
    # forward paths route ties to the first winning slot, so Pallas and
    # XLA dispatches share one gradient semantic (= autodiff through
    # gather+max up to duplicate-row ties, whose per-row sums agree)
    C = win.shape[-1]
    keys = (win * C
            + lax.broadcasted_iota(jnp.int32, win.shape, 2))  # [B,S,C]
    df = jax.vmap(
        lambda k, gg: jnp.zeros((n * C,), g.dtype)
        .at[k.reshape(-1)].add(gg.reshape(-1)))(keys, g)
    return df.reshape(win.shape[0], n, C), None


_gather_max_impl.defvjp(_gather_max_fwd, _gather_max_bwd)
