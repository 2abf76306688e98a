"""Calibrate the refine-classifier acceptance margin on a validation split.

The refine classifier is trained at `center_num=64` proposals but serves
at 1024-4000; the acceptance distribution drifts with proposal scale
(docs/ROADMAP.md).  This tool runs the cascade ONCE per validation scene
at the target inference preset, evaluates EVERY refined proposal
geometrically (one collision pass), and then sweeps the acceptance margin
tau on the host:

    accept(tau) = (logit_valid - logit_invalid > tau) & crop_valid

reporting VGR / antipodal / accepted-count per tau so a margin can be
picked for a precision target and passed to `cli.infer --accept-margin`.

With ``--real-clouds`` the same margin sweep additionally runs on the
reference's two committed real Kinect clouds
(test_file/real_data_predict): every refined proposal is funneled
through the view-collision check (eval_test settings) once, and the
sweep reports survivors / accepted / precision per margin — the
calibration VERDICT r4 item 2 asks to ship in the serving config.

Usage:
  python tools/calibrate_accept.py --data-path DIR --checkpoint DIR \
      [--center-num 4000] [--margins -2,-1,0,1,2] [--max-scenes 10] \
      [--real-clouds]
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
    p.add_argument("--data-path", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--group-num-more", type=int, default=2048)
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--margins", type=str,
                   default="-3,-2,-1,-0.5,0,0.5,1,2,3")
    p.add_argument("--max-scenes", type=int, default=10)
    p.add_argument("--split", type=str, default="validate")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--real-clouds", action="store_true",
                   help="also sweep the margin on the reference's two "
                        "committed real Kinect clouds (view-funnel "
                        "precision per margin)")
    p.add_argument("--fast", action="store_true",
                   help="serving config (bf16+slab+fpsG8)")
    p.add_argument("--refine-pose", default="full",
                   choices=["full", "center", "off"],
                   help="refinement-ablation knob (region.refine_pose) "
                        "to calibrate under")
    p.add_argument("--center-min-z", type=float, default=None,
                   help="above-plane center prior (serving knob)")
    p.add_argument("--pose-search", type=int, default=0,
                   help="theta-grid pose search K (serving knob)")
    p.add_argument("--refine-guard", action="store_true",
                   help="survivor-preserving refinement (serving knob)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import GraspDataset, load_scene
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.config import (
        infer_config, tiny_config)
    from regnet_for_3d_grasping_tpu.eval.evaluator import (
        eval_validate, view_num_from_path)

    if args.tiny:
        cfg = tiny_config(**{"region.refine_pose": args.refine_pose})
    else:
        over = {
            "region.center_num": args.center_num,
            "region.group_num_more": args.group_num_more,
            "region.num_points": args.num_points,
            "region.refine_pose": args.refine_pose,
            "region.center_min_z": args.center_min_z,
            "region.pose_search_k": args.pose_search,
            "region.refine_guard": args.refine_guard,
        }
        if args.fast:
            over.update({"model.fps_groups": 8,
                         "region.center_fps_groups": 8,
                         "region.slab_cell": 0.04})
        cfg = infer_config(**over)
    model = REGNet(cfg, dtype=jnp.bfloat16 if args.fast else None)
    margins = [float(m) for m in args.margins.split(",")]

    ds = GraspDataset(args.data_path, args.split, cfg.region.num_points,
                      cfg.region.max_gt_grasps)
    if not len(ds):
        raise SystemExit(f"no {args.split} scenes under {args.data_path}")

    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))
    variables = None
    g = cfg.gripper

    # per-margin accumulators: [vgr_count, score_sum, nocoll_view, formal]
    acc = {m: np.zeros(4) for m in margins}
    n_scenes = 0
    for batch in ds.batches(1, seed=0, shuffle=False, augment=False,
                            drop_last=False):
        if n_scenes >= args.max_scenes:
            break
        x = jnp.asarray(batch.pc)
        if variables is None:
            if args.checkpoint.endswith(".npz"):
                variables, epoch = ckpt.load_weights_npz(args.checkpoint)
                epoch += 1
            else:
                restored, epoch = ckpt.restore_checkpoint(args.checkpoint)
                variables = {"params": restored["params"],
                             "batch_stats": restored["batch_stats"]}
            print(f"checkpoint epoch {epoch - 1}; "
                  f"center_num={cfg.region.center_num}; "
                  f"{min(len(ds), args.max_scenes)} scenes")
        out = fwd(variables, x, jax.random.PRNGKey(n_scenes))

        candidate = (np.asarray(out.region_valid)
                     & np.asarray(out.crop_valid))[0]
        logits = np.asarray(out.refine_logits)[0]
        delta = logits[:, 1] - logits[:, 0]
        final = np.asarray(out.final_grasps)[0][:, :8]
        cand_idx = np.flatnonzero(candidate)
        if len(cand_idx) == 0:
            n_scenes += 1
            continue

        data = load_scene(batch.paths[0])
        try:
            view = view_num_from_path(batch.paths[0])
        except ValueError:
            view = 0
        # ONE collision pass over every refined candidate; margins only
        # re-aggregate the per-grasp results on the host
        tz = float(data.get("table_height", g.table_height))
        _, _, _, view_ok, scene_ok, anti = eval_validate(
            data, final[cand_idx], view, tz, g.depth,
            float(batch.width[0]), g, cfg.eval)
        d = delta[cand_idx]
        for m in margins:
            sel = d > m
            acc[m] += [float((scene_ok & sel).sum()),
                       float(anti[sel].sum()),
                       float((view_ok & sel).sum()),
                       float(sel.sum())]
        n_scenes += 1

    print(f"\n{'margin':>8} {'accepted':>9} {'nocoll_view':>12} "
          f"{'VGR':>7} {'antipodal':>10}")
    best = None
    for m in margins:
        vgr_c, score_s, nv, formal = acc[m]
        vgr = vgr_c / max(nv, 1)
        score = score_s / max(nv, 1)
        print(f"{m:>8.2f} {formal:>9.0f} {nv:>12.0f} {vgr:>7.3f} "
              f"{score:>10.3f}")
        # pick the smallest margin with VGR >= 0.95 and >= 5 grasps/scene
        if vgr >= 0.95 and formal >= 5 * n_scenes and best is None:
            best = m
    if best is not None:
        print(f"\nsuggested --accept-margin {best}")
    else:
        print("\nno margin met VGR>=0.95 with >=5 grasps/scene; "
              "inspect the table")

    if args.real_clouds:
        _sweep_real_clouds(fwd, variables, cfg, margins)


def _sweep_real_clouds(fwd, variables, cfg, margins):
    """Margin -> (accepted, survivors, precision) on the reference's two
    committed real Kinect clouds, using the view-collision funnel
    (eval_test settings — no dense scene cloud exists for real data)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.eval.collision import view_check_funnel
    from regnet_for_3d_grasping_tpu.utils.config import (
        EvalConfig, GripperConfig)

    ref_dir = "/root/reference/test_file/real_data_predict"
    g = GripperConfig()
    for ci, name in enumerate(("0000_cloud", "0001_cloud")):
        with open(os.path.join(ref_dir, name + ".p"), "rb") as f:
            golden = pickle.load(f)
        pts = np.asarray(golden["points"], np.float32)
        cols = np.asarray(golden["colors"], np.float32)
        rng = np.random.RandomState(1)
        cols = cols * (1 - rng.rand(3) / 5)
        sel = rng.choice(len(pts), cfg.region.num_points,
                         replace=len(pts) < cfg.region.num_points)
        pc = np.c_[pts[sel], cols[sel]].astype(np.float32)[None]
        out = fwd(variables, jnp.asarray(pc), jax.random.PRNGKey(400 + ci))

        candidate = (np.asarray(out.region_valid)
                     & np.asarray(out.crop_valid))[0]
        logits = np.asarray(out.refine_logits)[0]
        delta = (logits[:, 1] - logits[:, 0])[candidate]
        final = np.asarray(out.final_grasps)[0][candidate][:, :8]
        if not len(final):
            print(f"\n[real {name}] no candidates")
            continue
        masks = view_check_funnel(
            jnp.asarray(pts[:, :3], jnp.float32),
            jnp.asarray(final, jnp.float32),
            g.table_height, g.depth, g, EvalConfig(), table_sign=+1.0)
        surv = np.asarray(masks["survive"])
        print(f"\n[real {name}] margin sweep "
              f"({len(final)} refined candidates)")
        print(f"{'margin':>8} {'accepted':>9} {'survive':>8} "
              f"{'precision':>10}")
        for m in margins:
            a = delta > m
            acc_n, s_n = int(a.sum()), int((a & surv).sum())
            prec = s_n / max(acc_n, 1)
            print(f"{m:>8.2f} {acc_n:>9d} {s_n:>8d} {prec:>10.3f}")


if __name__ == "__main__":
    main()
