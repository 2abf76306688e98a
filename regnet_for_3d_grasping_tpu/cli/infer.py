"""Inference CLI — the reference's ``test.py`` re-imagined.

Runs the full SN->GRN->RN cascade on .p (virtual) or .pcd (real) clouds,
collision-filters the four grasp sets and writes the same prediction-pickle
schema as the reference (utils.py:412-424):
  {points, colors, scores, grasp_stage2, grasp_stage3_stage2,
   grasp_stage3, grasp_stage3_score}

Usage:
  python -m regnet_for_3d_grasping_tpu.cli.infer \
      --folder-name /path/to/virtual_data --checkpoint /path/to/ckpts
"""

from __future__ import annotations

import argparse
import copy
import glob
import os
import pickle
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="REGNet-TPU inference")
    p.add_argument("--folder-name", type=str, default="")
    p.add_argument("--file-name", type=str, default="")
    p.add_argument("--checkpoint", type=str, default="",
                   help="checkpoint directory (utils/checkpoint.py); "
                        "random init if empty")
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--group-num-more", type=int, default=2048)
    p.add_argument("--all-points-num", type=int, default=25600)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--no-eval", action="store_true",
                   help="skip the collision filter (raw grasp sets)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel serving: one cloud per device over "
                        "a 1-D mesh (parallel/infer.py); throughput "
                        "scales linearly — the per-cloud cascade needs no "
                        "cross-chip collectives")
    p.add_argument("--accept-margin", type=float, default=0.0,
                   help="refine-classifier acceptance margin "
                        "(logit[valid]-logit[invalid] > margin; 0 = the "
                        "reference argmax; calibrate with "
                        "tools/calibrate_accept.py)")
    p.add_argument("--num-refine", type=int, default=1,
                   help="iterative refinement passes (the reference "
                        "defines this flag but never implements it, "
                        "train.py:27; here >1 re-crops and re-refines)")
    p.add_argument("--fast", action="store_true",
                   help="the quality-gated serving configuration "
                        "(bf16 + sorted-slab kernels cell=0.04 + "
                        "stratified FPS G=8): ~3x the exact config's "
                        "throughput on TPU, frozen-suite VGR 0.966/"
                        "0.972 vs 0.933/0.947 exact "
                        "(docs/evidence/metrics_r03.json)")
    p.add_argument("--slab-cell", type=float, default=-1.0,
                   help="override the sorted-slab cell (0 = exact full "
                        "scans; default: 0.04 with --fast else 0)")
    p.add_argument("--fps-groups", type=int, default=-1,
                   help="override stratified-FPS groups (1 = exact; "
                        "default: 8 with --fast else 1)")
    p.add_argument("--center-select", default="fps",
                   choices=["fps", "bucket"],
                   help="center-selection algorithm "
                        "(region.center_select): 'bucket' = one-pass "
                        "stratified best-score pick, no sequential FPS "
                        "loop (quality-gated serving option)")
    p.add_argument("--center-min-z", type=float, default=None,
                   help="above-plane center prior (RegionConfig."
                        "center_min_z): restrict candidate centers to "
                        "points above this z — use the evaluation "
                        "protocol's table plane when the physical table "
                        "sits below it (real Kinect clouds)")
    p.add_argument("--pose-search", type=int, default=0,
                   help="serving pose search (RegionConfig.pose_search_"
                        "k): try K theta variants per proposal, keep "
                        "the funnel-surviving one nearest the "
                        "prediction; 0 = off (reference behaviour)")
    p.add_argument("--refine-guard", action="store_true",
                   help="survivor-preserving refinement "
                        "(RegionConfig.refine_guard): serve the stage-2 "
                        "pose wherever the refined pose fails the "
                        "view-collision funnel but the stage-2 pose "
                        "survives it (full-cloud funnel, same dispatch)")
    p.add_argument("--refine-pose", default="full",
                   choices=["full", "center", "off"],
                   help="refinement ablation (region.refine_pose): "
                        "'center' keeps the stage-2 orientation and "
                        "applies only the refined translation + score; "
                        "'off' keeps the whole stage-2 pose (classifier-"
                        "only refinement). Quality-gated serving knob "
                        "for domain-shifted inputs")
    return p


def load_cloud(pc_path: str, all_points_num: int,
               rng: np.random.RandomState):
    """Load + preprocess one input cloud (test.py:101-127)."""
    from regnet_for_3d_grasping_tpu.utils import pcd as pcdio

    real = pc_path.endswith(".pcd")
    if real:
        pts, colors = pcdio.read_pcd(pc_path)
        T = pcdio.camera_to_global_transform()
        pts = pcdio.transform_points(T, pts)
        pc = np.c_[pts, colors]
        # workspace crop (test.py:114-118)
        pc = pc[(pc[:, 0] < 0.26) & (pc[:, 0] > -0.4) & (pc[:, 2] < 1)
                & (pc[:, 1] < 0.65) & (pc[:, 1] > 0.2)]
    else:
        with open(pc_path, "rb") as f:
            data = pickle.load(f)
        pc = np.c_[data["view_cloud"].astype(np.float32),
                   data["view_cloud_color"].astype(np.float32)]

    pc_back = copy.deepcopy(pc[:, :3])
    color_back = copy.deepcopy(pc[:, 3:6])
    # color noise (utils.py:426-431)
    pc = pc.copy()
    pc[:, 3:6] *= (1 - rng.rand(3) / 5)

    sel = rng.choice(len(pc), all_points_num,
                     replace=len(pc) < all_points_num)
    return pc[sel].astype(np.float32), pc_back, color_back, real


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils.config import infer_config
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets
    from regnet_for_3d_grasping_tpu.eval.evaluator import eval_test

    slab_cell = args.slab_cell if args.slab_cell >= 0.0 else \
        (0.04 if args.fast else 0.0)
    fps_groups = args.fps_groups if args.fps_groups >= 1 else \
        (8 if args.fast else 1)
    cfg = infer_config(**{
        "region.center_num": args.center_num,
        "region.group_num_more": args.group_num_more,
        "region.num_points": args.all_points_num,
        "region.accept_margin": args.accept_margin,
        "region.refine_iters": args.num_refine,
        "region.slab_cell": slab_cell,
        "region.center_fps_groups": fps_groups,
        "model.fps_groups": fps_groups,
        "region.center_select": args.center_select,
        "region.refine_pose": args.refine_pose,
        "region.center_min_z": args.center_min_z,
        "region.pose_search_k": args.pose_search,
        "region.refine_guard": args.refine_guard,
    })
    dtype = jnp.bfloat16 if (args.bf16 or args.fast) else None
    model = REGNet(cfg, dtype=dtype)

    rng = np.random.RandomState(args.seed)
    if args.file_name:
        paths = [os.path.join(args.folder_name, args.file_name)]
    else:
        paths = sorted(glob.glob(os.path.join(args.folder_name, "*.p"))
                       + glob.glob(os.path.join(args.folder_name, "*.pcd")))
    if not paths:
        raise SystemExit(f"no input clouds under {args.folder_name!r}")

    if args.dp:
        from regnet_for_3d_grasping_tpu.parallel.infer import (
            make_dp_inference)
        from regnet_for_3d_grasping_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        group = mesh.devices.size
        fwd = make_dp_inference(model, mesh)
        print(f"data-parallel serving over {group} device(s)")
    else:
        group = 1
        fwd = jax.jit(lambda v, x, k: model.apply(
            v, x, train=False, rngs={"sampling": k}))

    variables = None
    for start in range(0, len(paths), group):
        chunk = paths[start:start + group]
        loaded = [load_cloud(p, args.all_points_num, rng) for p in chunk]
        x = jnp.asarray(np.stack([l[0] for l in loaded]))
        if len(chunk) < group:     # pad the final partial batch
            x = jnp.concatenate(
                [x, jnp.tile(x[:1], (group - len(chunk), 1, 1))])

        if variables is None:
            variables = jax.jit(lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "sampling": jax.random.PRNGKey(1)}, x))()
            if args.checkpoint.endswith(".npz"):
                # git-tracked weight artifact (utils/checkpoint.py
                # export_weights_npz)
                variables, epoch = ckpt.load_weights_npz(args.checkpoint)
                print(f"loaded weights (epoch {epoch}) "
                      f"from {args.checkpoint}")
            elif args.checkpoint:
                # train checkpoints carry optimizer state too; restore
                # untargeted and keep the inference subset (plain dicts
                # are fine for model.apply)
                restored, epoch = ckpt.restore_checkpoint(args.checkpoint)
                variables = {"params": restored["params"],
                             "batch_stats": restored["batch_stats"]}
                print(f"restored checkpoint epoch {epoch - 1} "
                      f"from {args.checkpoint}")

        t0 = time.time()
        out = jax.block_until_ready(
            fwd(variables, x, jax.random.PRNGKey(args.seed)))
        t1 = time.time()
        all_sets = extract_grasp_sets(out)

        for i, (pc_path, (pc, pc_back, color_back, real)) in enumerate(
                zip(chunk, loaded)):
            sets = all_sets[i]
            print(f"{pc_path}: forward {t1 - t0:.3f}s"
                  f"{f' ({len(chunk)} clouds)' if group > 1 else ''}, "
                  f"{len(sets['grasp_stage2'])} stage2 / "
                  f"{len(sets['grasp_stage3'])} stage3 grasps")
            _write_prediction(args, cfg, out, i, pc_path, sets,
                              pc_back, color_back, real)


def _write_prediction(args, cfg, out, i, pc_path, sets,
                      pc_back, color_back, real):
    from regnet_for_3d_grasping_tpu.eval.evaluator import eval_test

    if not args.no_eval:
        g = cfg.gripper
        for key in list(sets):
            sets[key] = eval_test(
                pc_back, sets[key], None, g.table_height, g.depth,
                g.width, g, cfg.eval)

    out_path = pc_path.replace("_data", "_data_predict")
    if real:
        out_path = out_path.replace(".pcd", ".p")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    output = {
        "points": pc_back,
        "colors": color_back,
        "scores": np.asarray(out.score[i]).reshape(-1, 1),
        **{k: np.asarray(v, np.float32) for k, v in sets.items()},
    }
    with open(out_path, "wb") as f:
        pickle.dump(output, f)
    print(f"  -> {out_path}")


if __name__ == "__main__":
    main()
