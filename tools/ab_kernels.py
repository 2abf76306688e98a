"""On-chip A/B of the gated Pallas kernels vs their XLA paths.

Round-2 perf work (docs/ROADMAP.md) added three candidate kernels whose
dispatch is gated pending a real-chip measurement:

  * ops/crop_pallas.closing_region_crop_pallas  vs  the chunked XLA
    geometry/region.closing_region_crop_dense path,
  * ops/group_pallas.group_regions_pallas       vs  the chunked XLA
    geometry/region.group_regions path,
  * ops/fps_pallas version=2 (aligned-tile centroid extraction) vs the
    shipping version=1,

all at the inference preset shapes (25,600 points, 4,000 proposals).
Prints per-variant amortized ms (>=20 dispatches, scalar-fetch sync —
timing rules in CLAUDE.md) plus an on-chip count-parity check, so the
dispatch thresholds in geometry/region.py and ops/fps_pallas.py can be
set from data rather than guesses.

Usage: python tools/ab_kernels.py [--centers 4000] [--iters 20]
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
    p.add_argument("--centers", type=int, default=4000)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.geometry import region as R
    from regnet_for_3d_grasping_tpu.geometry.codec import grasps_to_frames
    from regnet_for_3d_grasping_tpu.ops.crop_pallas import (
        closing_region_crop_pallas)
    from regnet_for_3d_grasping_tpu.ops.group_pallas import (
        group_regions_pallas)
    from regnet_for_3d_grasping_tpu.ops.fps_pallas import fps_pallas
    from regnet_for_3d_grasping_tpu.utils.config import infer_config

    cfg = infer_config(**{"region.center_num": args.centers})
    g = cfg.gripper
    NC = args.centers
    N = cfg.region.num_points
    print(f"device={jax.devices()[0]}  N={N}  NC={NC}")

    scene = make_synthetic_scene(0, num_view=N)
    pc = jnp.asarray(np.c_[scene["view_cloud"],
                           scene["view_cloud_color"]][None].astype(
                               np.float32))
    xyz = pc[..., :3]
    key = jax.random.PRNGKey(0)

    # plausible proposals: random cloud points as centers, axis_y ~ +y
    rng = np.random.default_rng(0)
    ci = rng.choice(N, NC, replace=False)
    centers = np.asarray(xyz[0])[ci]
    grasp = np.zeros((1, NC, 8), np.float32)
    grasp[0, :, :3] = centers
    grasp[0, :, 4] = 1.0
    grasp = jnp.asarray(grasp)
    centers6 = jnp.asarray(np.c_[centers, np.zeros((NC, 3),
                                                   np.float32)])[None]
    frames, bases = grasps_to_frames(grasp)
    seed = jnp.uint32(7)
    box = (0.0, g.depth / 2, g.width / 2, g.height / 2)

    # --- correctness spot checks (counts are exact in both paths) -------
    crop_xla = R.closing_region_crop_dense(key, pc, grasp, g,
                                           cfg.region.gripper_num)
    idx_p, cnt_p = closing_region_crop_pallas(
        xyz, frames, bases, seed, box, cfg.region.gripper_num)
    ok_crop = bool(jnp.all((cnt_p > 5) == crop_xla.valid))
    print(f"crop valid-mask parity: {ok_crop}")

    grp_xla = R.group_regions(key, pc, centers6, cfg.region.group_num,
                              cfg.group_radius, with_points=False)
    idx_g, cnt_g = group_regions_pallas(xyz, centers6[..., :3], seed,
                                        cfg.group_radius,
                                        cfg.region.group_num)
    ok_grp = bool(jnp.all((cnt_g > 0) == grp_xla.valid))
    print(f"group valid-mask parity: {ok_grp}")

    # --- timing ----------------------------------------------------------
    it = args.iters
    print("\n-- closing-region crop (dense, NC x N box test) --")
    a = bench("XLA chunked (closing_region_crop_dense)",
              lambda k: R.closing_region_crop_dense(
                  k, pc, grasp, g, cfg.region.gripper_num), key, iters=it)
    b = bench("Pallas fused (closing_region_crop_pallas)",
              lambda s: closing_region_crop_pallas(
                  xyz, frames, bases, s, box, cfg.region.gripper_num),
              seed, iters=it)
    print(f"   => pallas/xla = {b / a:.3f}x")

    print("\n-- radius grouping (NC x N, K=%d) --" % cfg.region.group_num)
    a = bench("XLA chunked (group_regions)",
              lambda k: R.group_regions(
                  k, pc, centers6, cfg.region.group_num, cfg.group_radius,
                  with_points=False), key, iters=it)
    b = bench("Pallas fused (group_regions_pallas)",
              lambda s: group_regions_pallas(
                  xyz, centers6[..., :3], s, cfg.group_radius,
                  cfg.region.group_num), seed, iters=it)
    print(f"   => pallas/xla = {b / a:.3f}x")

    print("\n-- backbone ball query (SA1: M=5120, N=25600, K=64) --")
    from regnet_for_3d_grasping_tpu import ops
    from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
        ball_query_pallas)
    sa_centers = xyz[:, :5120]
    a = bench("XLA bucketed (ops.ball_query)",
              lambda c: ops.ball_query(xyz, c, 0.02, 64),
              sa_centers, iters=it)
    b = bench("Pallas fused (ball_query_pallas)",
              lambda c: ball_query_pallas(xyz, c, 0.02, 64),
              sa_centers, iters=it)
    print(f"   => pallas/xla = {b / a:.3f}x")

    print("\n-- fused gather+max pooling (S x K x C) --")
    import regnet_for_3d_grasping_tpu.ops.pooling as gm
    from regnet_for_3d_grasping_tpu.ops.sampling import (
        bucket_stride, hash_uniform)
    feat32 = jnp.asarray(rng.standard_normal(
        (1, N, 256)).astype(np.float32))
    for K, label in ((cfg.region.group_num, "region"),
                     (cfg.region.gripper_num, "refine")):
        mask = jnp.asarray(rng.random((1, NC, N)) < 0.01)
        noise = hash_uniform(jax.random.PRNGKey(3), mask.shape)
        from regnet_for_3d_grasping_tpu.ops.sampling import bucket_choice
        idx, av, _ = bucket_choice(mask, K, score=noise)
        idx = jnp.where(av[..., None], idx, 0)
        stride = bucket_stride(N, K)
        for dt, feat in (("f32", feat32),
                         ("bf16", feat32.astype(jnp.bfloat16))):
            a = bench(f"XLA gather+max ({label} K={K}, {dt})",
                      lambda f, i: gm._xla_pooled(f, i), feat, idx,
                      iters=it)
            b = bench(f"Pallas gather_max ({label} K={K}, {dt})",
                      lambda f, i: gm.gather_max_pallas(f, i, stride),
                      feat, idx, iters=it)
            same = bool(jnp.all(
                gm.gather_max_pallas(feat, idx, stride)
                == gm._xla_pooled(feat, idx)))
            print(f"   => pallas/xla = {b / a:.3f}x   exact: {same}")
        c = bench(f"Pallas gather_max+argmax ({label} K={K}, f32)",
                  lambda f, i: gm.gather_max_pallas(
                      f, i, stride, with_argmax=True), feat32, idx,
                  iters=it)
        print(f"   => argmax overhead {c - b:.2f} ms vs bf16 variant")

    print("\n-- stratified grouped FPS (approximate, ops/fps.py) --")
    import regnet_for_3d_grasping_tpu.ops.fps as F
    for G in (1, 4, 8):
        bench(f"farthest_point_sample S=5120 groups={G}",
              lambda x: F.farthest_point_sample(x, 5120, groups=G),
              xyz, iters=it)
    for G in (1, 4, 8):
        bench(f"center FPS S={NC} masked groups={G}",
              lambda x, m: F.farthest_point_sample(x, NC, mask=m,
                                                   groups=G),
              xyz, jnp.asarray(rng.random((1, N)) < 0.3), iters=it)

    print("\n-- ball-query kernel version (SA1 shape: 5120 x %d) --" % N)
    from regnet_for_3d_grasping_tpu.ops.ball_query_pallas import (
        ball_query_pallas)
    c5120 = xyz[:, :5120]
    a = bench("ball_query_pallas v1 (diff-square VPU)",
              lambda x, c: ball_query_pallas(x, c, 0.07, 64,
                                             version=1)[1],
              xyz, c5120, iters=it)
    b = bench("ball_query_pallas v2 (MXU cross term)",
              lambda x, c: ball_query_pallas(x, c, 0.07, 64,
                                             version=2)[1],
              xyz, c5120, iters=it)
    c1 = ball_query_pallas(xyz, c5120, 0.07, 64, version=1)[1]
    c2 = ball_query_pallas(xyz, c5120, 0.07, 64, version=2)[1]
    dmax = int(jnp.max(jnp.abs(c1.astype(jnp.int32)
                               - c2.astype(jnp.int32))))
    print(f"   => v2/v1 = {b / a:.3f}x   max count diff {dmax} "
          "(f32 boundary rounding)")

    print("\n-- three-NN kernel version (FP3 shape: %d queries x 5120 "
          "keys) --" % N)
    from regnet_for_3d_grasping_tpu.ops.knn_pallas import three_nn_pallas
    keys5120 = xyz[:, :5120]
    a = bench("three_nn_pallas v1 (diff-square VPU)",
              lambda q, k: three_nn_pallas(q, k, version=1)[1],
              xyz, keys5120, iters=it)
    b = bench("three_nn_pallas v2 (MXU cross term)",
              lambda q, k: three_nn_pallas(q, k, version=2)[1],
              xyz, keys5120, iters=it)
    i1, d1 = three_nn_pallas(xyz, keys5120, version=1)
    i2, d2 = three_nn_pallas(xyz, keys5120, version=2)
    same = float(jnp.mean((i1 == i2).astype(jnp.float32)))
    derr = float(jnp.max(jnp.abs(d1 - d2)))
    print(f"   => v2/v1 = {b / a:.3f}x   idx agree {same:.5f}  "
          f"max |d2 err| {derr:.2e}")

    print("\n-- FPS kernel version (N=%d -> S) --" % N)
    dist = jnp.full((1, N), 1e10, jnp.float32)
    for S in (5120, NC):
        a = bench(f"fps_pallas v1 (S={S})",
                  lambda x, d: fps_pallas(x, d, S, version=1),
                  xyz, dist, iters=it)
        b = bench(f"fps_pallas v2 (S={S})",
                  lambda x, d: fps_pallas(x, d, S, version=2),
                  xyz, dist, iters=it)
        same = bool(jnp.all(fps_pallas(xyz, dist, S, version=1)
                            == fps_pallas(xyz, dist, S, version=2)))
        print(f"   => v2/v1 = {b / a:.3f}x   indices identical: {same}")


if __name__ == "__main__":
    main()
