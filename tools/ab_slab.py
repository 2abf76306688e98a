"""On-chip A/B of the sorted-slab kernels vs the shipped dispatches.

Times, at the inference preset's shapes on a real synthetic scene (so the
slab occupancy is realistic):

  * region grouping: XLA bucket path (current dispatch) vs group_slab
  * closing-region crop: full-scan Pallas (current) vs crop_slab
  * region pooled feature: gather_max (current) vs gather_max_slab
  * gripper pooled feature: same at the crop shape

plus exactness checks of the slab counts against the shipped paths.

Usage: python tools/ab_slab.py [--cell 0.04] [--centers 4000] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(name, fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(fn(*a))))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", type=float, default=0.04)
    p.add_argument("--centers", type=int, default=4000)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu import ops
    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.geometry import region as R
    from regnet_for_3d_grasping_tpu.ops import slab
    from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
        closing_region_crop_pallas)
    from regnet_for_3d_grasping_tpu.utils.config import infer_config

    cfg = infer_config(**{"region.center_num": args.centers})
    NC = args.centers
    N = cfg.region.num_points
    scene = make_synthetic_scene(0, num_view=N)
    pts = scene["view_cloud"].astype(np.float32)
    pc = jnp.asarray(pts[None])
    print(f"device={jax.devices()[0]}  cell={args.cell}  centers={NC}")

    key = jax.random.PRNGKey(0)
    k_sort, k_sel = jax.random.split(key)
    _, sc = slab.sort_cloud(k_sort, pc, args.cell)
    sc = jax.tree.map(jax.block_until_ready, sc)
    bench("sort_cloud (once per forward)",
          lambda p_: slab.sort_cloud(k_sort, p_, args.cell), pc)

    # centers: random cloud subset sorted by x (graspable-point stand-in)
    rng = np.random.RandomState(0)
    c = pts[rng.choice(N, NC, False)]
    c = c[np.argsort(c[:, 0])]
    centers = jnp.asarray(c[None])
    seed = jnp.uint32(7)

    # --- region grouping -------------------------------------------------
    r = cfg.group_radius
    GN = cfg.region.group_num
    t_xla = bench("group: XLA bucket path (dispatch)",
                  lambda k_, p_, c_: R.group_regions(
                      k_, p_, c_, GN, r, with_points=False),
                  k_sel, pc, centers)
    t_slab = bench("group: group_slab",
                   lambda s_, c_: slab.group_slab(s_, c_, seed, r, GN,
                                                  args.cell),
                   sc, centers)
    gs = R.group_regions(k_sel, pc, centers, GN, r, with_points=False)
    idx, cnt, sel, off = slab.group_slab(sc, centers, seed, r, GN,
                                         args.cell)
    # counts: XLA path doesn't return counts; compare valid masks + a
    # brute-force count on a center subset
    sub = jnp.asarray(rng.choice(NC, 256, False))
    d2 = jnp.sum((centers[0, sub][:, None] - sc.xyz[0][None]) ** 2, -1)
    ref_cnt = jnp.sum(d2 <= r * r, -1)
    print("  group count exact on subset:",
          bool(jnp.all(cnt[0, sub] == ref_cnt)),
          " valid match:", float(jnp.mean(
              (cnt[0] > 0) == gs.valid[0])))
    print(f"  => group {t_xla:.2f} -> {t_slab:.2f} ms "
          f"({t_xla / t_slab:.2f}x)")

    # --- closing-region crop --------------------------------------------
    g = cfg.gripper
    K = cfg.region.gripper_num
    grasp = np.zeros((1, NC, 8), np.float32)
    grasp[0, :, :3] = c
    # random unit axis_y + theta
    ax = rng.randn(NC, 3).astype(np.float32)
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    grasp[0, :, 3:6] = ax
    grasp[0, :, 6] = rng.uniform(-np.pi, np.pi, NC)
    grasp = jnp.asarray(grasp)
    from regnet_for_3d_grasping_tpu.geometry.codec import grasps_to_frames
    frame, center = grasps_to_frames(grasp)
    box = (0.0, g.depth / 2, g.width / 2, g.height / 2)

    t_full = bench("crop: full-scan Pallas (dispatch)",
                   lambda x_, f_, c_: closing_region_crop_pallas(
                       x_, f_, c_, jnp.uint32(7), box, K),
                   sc.xyz, frame, center)
    t_cslab = bench("crop: crop_slab",
                    lambda s_, f_, c_: slab.crop_slab(
                        s_, f_, c_, seed, box, K, args.cell),
                    sc, frame, center)
    ci, ccnt, csel, coff = slab.crop_slab(sc, frame, center, seed, box, K,
                                          args.cell)
    fi, fcnt = closing_region_crop_pallas(sc.xyz, frame, center,
                                          jnp.uint32(7), box, K)
    print("  crop count exact vs full kernel:",
          bool(jnp.all(ccnt == fcnt)),
          " sel_any mean:", float(jnp.mean(csel)))
    print(f"  => crop {t_full:.2f} -> {t_cslab:.2f} ms "
          f"({t_full / t_cslab:.2f}x)")

    # --- fused pooling ----------------------------------------------------
    C = cfg.model.feature_channels
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    feat = jnp.asarray(rng.randn(1, N, C).astype(np.float32)).astype(dtype)
    stride = R.group_stride(NC, N, GN)
    t_gm = bench("pool region: gather_max (dispatch)",
                 lambda f_, i_: ops.gather_max(f_, gs.index, stride=stride),
                 feat, gs.index)
    t_gms = bench("pool region: gather_max_slab",
                  lambda f_, i_, o_: slab.gather_max_slab(
                      f_, i_, o_, slab.GROUP_WIN, slab.GROUP_SPW),
                  feat, idx, off)
    pooled = slab.gather_max_slab(feat, idx, off, slab.GROUP_WIN,
                                  slab.GROUP_SPW)
    ref = jnp.max(ops.group_points(feat, idx), axis=-2)
    m = sel[..., None] & jnp.ones_like(ref, bool)
    print("  pooled exact vs gather ref:",
          bool(jnp.all(jnp.where(m, pooled == ref, True))))
    print(f"  => region pool {t_gm:.2f} -> {t_gms:.2f} ms")

    c_stride = R.dense_crop_stride(NC, N, K)
    t_gc = bench("pool gripper: gather_max (dispatch)",
                 lambda f_, i_: ops.gather_max(f_, fi, stride=c_stride),
                 feat, fi)
    t_gcs = bench("pool gripper: gather_max_slab",
                  lambda f_, i_, o_: slab.gather_max_slab(
                      f_, i_, o_, slab.CROP_WIN, slab.CROP_SPW),
                  feat, ci, coff)
    print(f"  => gripper pool {t_gc:.2f} -> {t_gcs:.2f} ms")

    tot_cur = t_xla + t_full + t_gm + t_gc
    tot_slab = t_slab + t_cslab + t_gms + t_gcs
    print(f"\nTOTAL current {tot_cur:.2f} ms  vs slab {tot_slab:.2f} ms "
          f"(+ sort once)")


if __name__ == "__main__":
    main()
