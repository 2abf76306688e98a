"""Per-stage timing of the inference pipeline on the attached device.

Usage: python tools/profile_stages.py [--centers 4000] [--bf16]

Times each pipeline stage in isolation (amortized dispatches, scalar
fetch — see .claude/skills/verify/SKILL.md for why) so perf work targets
the right op.
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
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--centers", type=int, default=4000)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--slab-cell", type=float, default=0.0,
                   help="profile the sorted-slab stages (ops/slab.py) "
                        "and the FULL forward in slab mode")
    p.add_argument("--fps-groups", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu import ops
    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.geometry import region as R
    from regnet_for_3d_grasping_tpu.models import REGNet, ScoreNet
    from regnet_for_3d_grasping_tpu.utils.config import infer_config

    cfg = infer_config(**{"region.center_num": args.centers,
                          "region.slab_cell": args.slab_cell,
                          "model.fps_groups": args.fps_groups,
                          "region.center_fps_groups": args.fps_groups})
    dtype = jnp.bfloat16 if args.bf16 else None
    scene = make_synthetic_scene(0, num_view=cfg.region.num_points)
    pc = jnp.asarray(np.c_[scene["view_cloud"],
                           scene["view_cloud_color"]][None].astype(
                               np.float32))
    print(f"device={jax.devices()[0]}  centers={args.centers}  "
          f"dtype={'bf16' if args.bf16 else 'f32'}  "
          f"slab_cell={args.slab_cell}  fps_groups={args.fps_groups}")

    if args.slab_cell > 0.0:
        from regnet_for_3d_grasping_tpu.ops import slab as slab_ops
        cell = args.slab_cell
        bench("sort_cloud (once per forward)",
              lambda p_: slab_ops.sort_cloud(jax.random.PRNGKey(0), p_,
                                             cell), pc)
        pc_s, sc = slab_ops.sort_cloud(jax.random.PRNGKey(0), pc, cell)
        sa1 = cfg.model
        cj = ops.gather_points(sc.xyz, ops.farthest_point_sample(
            sc.xyz, sa1.num_centroids[0], groups=args.fps_groups))
        cj = jnp.take_along_axis(
            cj, jnp.argsort(cj[..., 0], axis=-1)[..., None], axis=1)
        bench("SA1 slab ball query",
              lambda s_, c_: slab_ops.ball_query_slab(
                  s_, c_, jnp.uint32(7), sa1.radii[0],
                  sa1.num_neighbours[0], cell), sc, cj)
        bench("FP3 slab three-NN",
              lambda q_, k_: slab_ops.three_nn_slab(q_, k_, bound=0.06),
              sc.xyz, cj)

    snet = ScoreNet(cfg.model, dtype=dtype)
    sv = jax.jit(lambda: snet.init(jax.random.PRNGKey(0), pc))()
    snet_apply = jax.jit(lambda x: snet.apply(sv, x))
    feature, score = snet_apply(pc)     # compile once, reuse below
    bench("ScoreNet backbone (no-slab entry)", snet_apply, pc)
    if args.slab_cell > 0.0:
        snet_slab = jax.jit(lambda x, s: snet.apply(
            sv, x, sc=s, slab_cell=args.slab_cell,
            rngs={"sampling": jax.random.PRNGKey(3)}))
        bench("ScoreNet backbone (slab SA1+FP3)", snet_slab, pc_s, sc)
    centers, _ = R.select_score_centers(pc, score, cfg.region.center_num,
                                        cfg.region.score_thre)
    key = jax.random.PRNGKey(0)
    bench("center select (masked FPS)",
          lambda p, s: R.select_score_centers(
              p, s, cfg.region.center_num, cfg.region.score_thre),
          pc, score)
    bench("two-scale grouping (train path)",
          lambda k, p, c: R.group_regions_two_scales(
              k, p, c, cfg.region.group_num, cfg.group_radius,
              cfg.region.group_num_more, cfg.group_radius_more),
          key, pc, centers)
    bench("single-scale grouping (model inference path)",
          lambda k, p, c: R.group_regions(
              k, p, c, cfg.region.group_num, cfg.group_radius,
              with_points=False),
          key, pc, centers)
    groups, groups_more = R.group_regions_two_scales(
        key, pc, centers, cfg.region.group_num, cfg.group_radius,
        cfg.region.group_num_more, cfg.group_radius_more)
    bench("region feature gather (unfused reference)",
          lambda f, i: ops.group_points(f, i), feature, groups.index)
    g_stride = R.group_stride(args.centers, cfg.region.num_points,
                              cfg.region.group_num)
    bench("region pooled feature (fused gather_max)",
          lambda f, i: ops.gather_max(f, i, stride=g_stride),
          feature, groups.index)
    grasp = jnp.zeros((1, args.centers, 8)).at[..., 4].set(1.0)
    bench("closing-region crop (wide-region variant)",
          lambda k, p, gi, g: R.closing_region_crop(
              k, p, gi, g, cfg.gripper, cfg.region.gripper_num,
              with_points=False),
          key, pc, groups_more.index, grasp)
    # the model's actual refine path: dense crop + gripper feature gather
    bench("closing-region crop (dense, model path)",
          lambda k, p, g: R.closing_region_crop_dense(
              k, p, g, cfg.gripper, cfg.region.gripper_num),
          key, pc, grasp)
    crop = R.closing_region_crop_dense(key, pc, grasp, cfg.gripper,
                                       cfg.region.gripper_num)
    bench("gripper feature gather (unfused reference)",
          lambda f, i: ops.group_points(f, i), feature, crop.index_in_all)
    c_stride = R.dense_crop_stride(args.centers, cfg.region.num_points,
                                   cfg.region.gripper_num)
    bench("gripper pooled feature (fused gather_max)",
          lambda f, i: ops.gather_max(f, i, stride=c_stride),
          feature, crop.index_in_all)

    model = REGNet(cfg, dtype=dtype)
    mv = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, pc))()
    total = bench("FULL forward", lambda x, k: model.apply(
        mv, x, rngs={"sampling": k}), pc, jax.random.PRNGKey(2), iters=10)
    print(f"\n=> {1000.0 / total:.2f} clouds/sec")


if __name__ == "__main__":
    main()
