"""Pallas TPU kernel for farthest point sampling.

The lax.scan FPS (ops/fps.py) pays ~10us of XLA loop sequencing per step —
at 5120 samples that's ~50ms, the largest single op in the pipeline after
the bucket-selection rewrite.  This kernel runs the whole iterative loop
inside one Mosaic program with the cloud and the running distance field
resident in VMEM (25.6k points x 3 coords = 300KB), so each step is a
handful of fused VPU passes: distance to the new centroid, running min,
and a masked argmax.

Replaces ``csrc/sampling_kernel.cu:42-170`` (one CUDA block per batch with
a shared-memory argmax tree); here the grid is (B,) with one program per
batch element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(num_samples: int, xyz_ref, dist_init_ref, idx_ref,
                dist_ref):
    """xyz [3, N], dist_init [1, N] (1e10 valid / -1 invalid) -> idx [1, S].

    idx_ref lives in SMEM (scalar stores at dynamic offsets are legal
    there; Mosaic requires 128-aligned dynamic VMEM accesses).  The
    centroid coordinates are extracted with a masked reduction instead of
    a dynamic VMEM load for the same reason.
    """
    dist_ref[:] = dist_init_ref[:]
    n = xyz_ref.shape[1]
    ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def argmax_first(v):
        # Mosaic's argmax tie-break is lane-order dependent; FPS parity
        # needs first-index ties (the CUDA kernel scans ascending).
        m = jnp.max(v)
        return jnp.min(jnp.where(v == m, ids, n)).astype(jnp.int32)

    # first centroid = first valid point
    start = argmax_first(dist_init_ref[:])

    def body(i, farthest):
        idx_ref[0, i] = farthest
        sel = (ids == farthest)
        c = jnp.sum(jnp.where(sel, xyz_ref[:], 0.0), axis=1,
                    keepdims=True)                    # [3, 1]
        d = jnp.sum(jnp.square(xyz_ref[:] - c), axis=0, keepdims=True)
        dist = dist_ref[:]
        dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
        dist_ref[:] = dist
        return argmax_first(dist)

    lax.fori_loop(0, num_samples, body, start)


@functools.partial(jax.jit, static_argnums=(2,))
def fps_pallas(xyz: jax.Array, dist_init: jax.Array,
               num_samples: int) -> jax.Array:
    """Batched Pallas FPS.

    Args:
      xyz: [B, N, 3] float32 points.
      dist_init: [B, N] float32 — 1e10 for selectable points, -1.0 for
        masked-out points (they only get picked once every valid point is
        exhausted, matching ops/fps.py semantics).
      num_samples: S (static).

    Returns:
      [B, S] int32 indices.
    """
    B, N, _ = xyz.shape
    pad = (-N) % 128
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # [B, 3, N]
    if pad:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, pad)))
        dist_init = jnp.pad(dist_init, ((0, 0), (0, pad)),
                            constant_values=-1.0)
    Np = N + pad

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, 3, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, num_samples), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, Np), jnp.float32)],
    )(xyz_t, dist_init[:, None, :])
    return out[:, 0, :]
