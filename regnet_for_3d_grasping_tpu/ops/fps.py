"""Farthest point sampling for TPU.

TPU-native equivalent of the reference CUDA kernel
``csrc/sampling_kernel.cu:42-170`` (iterative FPS, one block per batch,
shared-memory argmax).  FPS is inherently sequential over samples; the TPU
formulation runs one ``lax.scan`` over samples with the full [B, N] distance
update and argmax vectorized on the VPU each step, so all batch elements
advance in lockstep.

Extensions over the reference op:
  * an optional validity ``mask`` — the reference instead gathers the positive
    subset on the host (``get_regiondataset.py:354-434``); here masked points
    simply never win the argmax, keeping shapes static;
  * rows with no valid point fall back to treating every point as valid
    (matching the reference's random-centers fallback semantics,
    ``get_regiondataset.py:427-429``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e10)

# Above this B*N*S work the Pallas kernel (ops/fps_pallas.py) wins on chip;
# below it the lax.scan version avoids a ~5min Mosaic compile per shape
# variant (cached persistently thereafter — utils/cache.py).  On-chip A/B
# (v5e 2026-08-17): 25600x5120 3.3ms, 5120x1024 2.18ms (scan 4.96, 2.27x),
# 1024x256 2.17ms (scan 2.55, 1.17x) — the kernel still wins at 2^18 work,
# so every interior-FPS call site in the model dispatches to it.
# The batch dim counts: grouped FPS (groups=G) runs as B*G slices of
# N/G x S/G, whose per-slice product would otherwise fall under the
# threshold and hit the scan path's per-step dispatch overhead
# (tools/ab_kernels.py 2026-08-17: groups=8 measured SLOWER than exact
# until the batched work was counted).
_PALLAS_WORK_THRESHOLD = 1 << 18


def _use_pallas(n: int, num_samples: int, batch: int = 1) -> bool:
    if batch * n * num_samples < _PALLAS_WORK_THRESHOLD:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _dist_init(xyz: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Sentinel distance field: 1e10 for selectable points, -1 for masked
    ones (they lose every argmax against valid points, whose min-distance
    stays >= 0, so they're picked only once the valid set is exhausted).
    Rows with no valid point fall back to all-valid; NaN points are
    excluded — and, under shard_map, the mask arithmetic ties the scan
    carry's varying-axes type to xyz (a constant-only carry breaks vma
    typing)."""
    B, N, _ = xyz.shape
    if mask is None:
        valid = jnp.ones((B, N), dtype=bool)
    else:
        valid = mask
        any_valid = jnp.any(valid, axis=1, keepdims=True)
        valid = jnp.where(any_valid, valid, True)
    valid = valid & ~jnp.isnan(xyz[..., 0])
    return jnp.where(valid, _INF, jnp.float32(-1.0))


def farthest_point_sample(xyz: jax.Array, num_samples: int,
                          mask: jax.Array | None = None,
                          groups: int = 1) -> jax.Array:
    """Iteratively sample the `num_samples` mutually farthest points.

    Args:
      xyz: [B, N, 3] point coordinates.
      num_samples: number of centroids to select (static).
      mask: optional [B, N] bool; False points are never selected while any
        True point remains unselected.
      groups: 1 (default) = exact reference semantics.  G>1 = stratified
        approximate FPS: the point axis is split into G contiguous slices
        — random subsets, because this framework's clouds are randomly
        resampled (scoredataset.py:68-75) — and exact FPS of
        num_samples/G runs in each slice INDEPENDENTLY via the batch
        dimension.  Sequential depth and total work both drop by G
        (exact FPS is O(S*N) with S dependent steps; grouped is
        O(S/G * N/G) per slice, all slices in parallel).  Spread quality
        degrades only by the sampling noise between slices; gate any use
        with tools/holdout_eval.py / tools/benchmark_eval.py (VERDICT r2
        item 2).  Requires N % G == 0 and num_samples % G == 0.

    Returns:
      [B, num_samples] int32 indices into N.  The first selected index is the
      first valid point (index 0 when unmasked, as in the CUDA kernel's
      "explicitly choose the first point" — sampling_kernel.cu:65).
      When fewer than `num_samples` points are valid, the remaining slots
      repeat already-selected valid points (static-shape analogue of the
      reference's random-with-replacement padding).
      With groups=G the index list is ordered slice-major (all of slice
      0's picks first); downstream consumers treat centroids as a set.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    if groups > 1:
        assert N % groups == 0 and num_samples % groups == 0, \
            (N, num_samples, groups)
        L = N // groups
        s_per = num_samples // groups
        if _use_pallas(L, s_per, B * groups):
            # Fused kernel: all G slices advance in ONE sequential step
            # (S/G total steps).  Routing slices through the batch axis
            # instead serializes them on the single TensorCore and keeps
            # the step count at S — measured only ~1.3x vs exact, where
            # the fused kernel reaches ~Gx (tools/ab_kernels.py).
            from regnet_for_3d_grasping_tpu.ops.fps_pallas import (
                fps_pallas_grouped)
            mg = None if mask is None else mask.reshape(B * groups, L)
            dist = _dist_init(xyz.reshape(B * groups, L, 3), mg)
            return fps_pallas_grouped(xyz, dist.reshape(B, N),
                                      num_samples, groups)
        xg = xyz.reshape(B * groups, L, 3)
        mg = None if mask is None else mask.reshape(B * groups, L)
        idx = farthest_point_sample(xg, num_samples // groups, mg)
        offs = (jnp.arange(groups, dtype=jnp.int32) * L)[None, :, None]
        return (idx.reshape(B, groups, -1) + offs).reshape(B, num_samples)

    dist = _dist_init(xyz, mask)

    if _use_pallas(N, num_samples, B):
        from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
        # version=2 (aligned-tile centroid extraction) measures 0.85-0.96x
        # of v1 at every bench shape with bit-identical indices
        # (tools/ab_kernels.py, v5e 2026-08-16).
        return fps_pallas(xyz, dist, num_samples, version=2)

    # First pick = first valid point (jnp.argmax returns the first max,
    # and valid sentinels 1e10 dominate the -1 invalid ones).
    start = jnp.argmax(dist, axis=1).astype(jnp.int32)

    def step(carry, _):
        dist, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum(jnp.square(xyz - centroid), axis=-1)
        dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
        nxt = jnp.argmax(dist, axis=1).astype(jnp.int32)
        return (dist, nxt), farthest

    (_, _), idx = lax.scan(step, (dist, start), None, length=num_samples)
    return jnp.transpose(idx)  # [B, num_samples]
