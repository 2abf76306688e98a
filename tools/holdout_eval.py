"""Held-out stage-3 evidence: VGR across unseen scenes x checkpoint epochs.

VERDICT round-1 task 2's acceptance criterion: held-out stage-3 VGR
>= 0.95 with quantified epoch-to-epoch variance across >= 5 unseen scenes
at the 4000-center inference preset.  This tool generates fresh synthetic
scenes (seeds far outside the training range), runs the full cascade from
each of the last K epoch checkpoints, and prints a per-epoch x per-scene
VGR/antipodal table with mean/std.

Usage:
  python tools/holdout_eval.py --checkpoint assets/models/r2_jitter \
      [--epochs 95,96,97,98,99] [--scenes 6] [--center-num 4000]
      [--accept-margin 0.0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--epochs", type=str, default="",
                   help="comma list; default = last 5 available")
    p.add_argument("--scenes", type=int, default=6)
    p.add_argument("--scene-seed0", type=int, default=7000,
                   help="first unseen-scene seed (training uses 0..N)")
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--group-num-more", type=int, default=2048)
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--accept-margin", type=float, default=0.0)
    p.add_argument("--stage", type=str, default="stage3_score",
                   choices=["stage2", "stage3", "stage3_score"])
    p.add_argument("--num-objects", type=int, default=0,
                   help="objects per held-out scene (0 = generator "
                        "default 4-8, the round-2 clutter level; 2-3 "
                        "matches round-1's sparse scenes)")
    p.add_argument("--top-k", type=int, default=0,
                   help="rank accepted grasps by predicted score and "
                        "evaluate only the K best per scene — the "
                        "serving metric (a robot executes its best "
                        "grasps, reference vis highlights the top one); "
                        "0 = all accepted grasps (reference VGR parity)")
    p.add_argument("--diverse", action="store_true",
                   help="with --top-k: spatial-NMS diverse selection "
                        "(utils/export.select_diverse_grasps) instead of "
                        "naive score order")
    p.add_argument("--bf16", action="store_true",
                   help="run the cascade in bfloat16 compute (quality "
                        "check for the fast inference path)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.config import infer_config
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets
    from regnet_for_3d_grasping_tpu.eval.evaluator import (
        evaluate_scene_grasps)

    cfg = infer_config(**{
        "region.center_num": args.center_num,
        "region.group_num_more": args.group_num_more,
        "region.num_points": args.num_points,
        "region.accept_margin": args.accept_margin,
    })
    model = REGNet(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))
    g = cfg.gripper

    if args.epochs:
        epochs = [int(e) for e in args.epochs.split(",")]
    else:
        last = ckpt.latest_epoch(args.checkpoint)
        if last is None:
            raise SystemExit(f"no checkpoints under {args.checkpoint}")
        epochs = list(range(max(0, last - 4), last + 1))

    scenes = []
    for i in range(args.scenes):
        seed = args.scene_seed0 + i
        s = make_synthetic_scene(seed, num_view=cfg.region.num_points,
                                 num_objects=args.num_objects or None,
                                 view_index=i % 4)
        pc = np.c_[s["view_cloud"], s["view_cloud_color"]].astype(
            np.float32)[None]
        scenes.append((seed, i % 4, s, jnp.asarray(pc)))

    stage_key = {"stage2": "grasp_stage2", "stage3": "grasp_stage3",
                 "stage3_score": "grasp_stage3_score"}[args.stage]
    print(f"stage={args.stage} margin={args.accept_margin} "
          f"centers={args.center_num}")
    header = "epoch " + " ".join(f"s{seed}" for seed, *_ in scenes) \
        + "   mean_vgr mean_anti mean_n"
    print(header)

    per_epoch = []
    for e in epochs:
        restored, _ = ckpt.restore_checkpoint(args.checkpoint, epoch=e)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        vgrs, antis, counts = [], [], []
        for si, (seed, view, s, pc) in enumerate(scenes):
            out = fwd(variables, pc, jax.random.PRNGKey(1000 + si))
            grasps = extract_grasp_sets(out)[0][stage_key]
            if args.top_k and len(grasps):
                if args.diverse:
                    from regnet_for_3d_grasping_tpu.utils.export import (
                        select_diverse_grasps)
                    grasps = select_diverse_grasps(
                        np.asarray(grasps), args.top_k)
                else:
                    order = np.argsort(-np.asarray(grasps)[:, 7])
                    grasps = np.asarray(grasps)[order[:args.top_k]]
            if len(grasps) == 0:
                vgrs.append(0.0)
                antis.append(0.0)
                counts.append(0)
                continue
            rec = evaluate_scene_grasps(
                s, grasps, view, g.table_height, g.depth, g.width, g,
                cfg.eval)
            vgrs.append(rec.vgr)
            antis.append(rec.score)
            counts.append(len(grasps))
        per_epoch.append((e, vgrs, antis, counts))
        print(f"{e:5d} " + " ".join(f"{v:.2f}" for v in vgrs)
              + f"   {np.mean(vgrs):8.3f} {np.mean(antis):9.3f} "
              f"{np.mean(counts):6.0f}")

    all_vgr = np.array([v for _, vgrs, _, _ in per_epoch for v in vgrs])
    ep_means = np.array([np.mean(vgrs) for _, vgrs, _, _ in per_epoch])
    print(f"\noverall VGR mean {all_vgr.mean():.3f} "
          f"(per-scene std {all_vgr.std():.3f}); "
          f"epoch-to-epoch mean-VGR std {ep_means.std():.3f}")


if __name__ == "__main__":
    main()
