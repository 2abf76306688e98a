"""Controlled probe: geometric sensor-noise robustness of a checkpoint.

The round-4 real-data evidence (docs/evidence/real_data_r4_retrained.json)
fixed the score-head color collapse but left a geometric gap: on the
reference's committed real Kinect clouds most of our predicted grasps
fail the above-table and finger-collision checks, i.e. the predicted
ORIENTATIONS are off on real geometry.  The synthetic training scenes
are analytically noiseless (table exactly at z=0.75, exact surface
samples); real Kinect returns carry depth-dependent axial noise,
lateral jitter and depth quantization.

This probe corrupts ONLY the model input (the view cloud handed to the
cascade) with a standard Kinect noise model [Nguyen, Izadi, Lovell 2012
magnitudes] at several severities, evaluates the resulting grasps
against the CLEAN scene geometry, and prints VGR/antipodal per
(corruption, severity).  A large drop pinpoints what a retrain must
augment; a flat table means the remaining real-data gap is object-shape
domain shift, not sensor noise.

Usage:
  python tools/probe_sensor_noise.py --weights weights/r4_coherent_e100.npz
      [--scenes 4] [--center-num 4000] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from regnet_for_3d_grasping_tpu.data.augment import kinect_corrupt


CORRUPTIONS = {
    "clean":   {},
    "axial1":  {"axial": 1.0},
    "axial2":  {"axial": 2.0},
    "lateral1": {"lateral": 1.0},
    "quant1":  {"quant": 1.0},
    "drop20":  {"dropout": 0.2},
    "kinect1": {"axial": 1.0, "lateral": 1.0, "quant": 1.0,
                "dropout": 0.1},
    "kinect2": {"axial": 2.0, "lateral": 2.0, "quant": 2.0,
                "dropout": 0.2},
    # global table-height shift: the model sees the scene `zshift`
    # meters lower/higher; predicted grasps are shifted BACK before
    # evaluation against the clean geometry, isolating the score/region
    # heads' z-sensitivity (0000_cloud's real table sits ~0.055 m below
    # the synthetic z=0.75 plane).
    "zdown55": {"zshift": -0.055},
    "zdown25": {"zshift": -0.025},
    "zup25":   {"zshift": +0.025},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="weights/r4_coherent_e100.npz")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--scene-seed0", type=int, default=9000)
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--fast", action="store_true",
                   help="bf16+slab+fpsG8 serving config")
    p.add_argument("--only", type=str, default="",
                   help="comma list of corruption names (default: all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.data.synthetic import _CAMERA_POSE
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.config import infer_config
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets
    from regnet_for_3d_grasping_tpu.eval.evaluator import (
        evaluate_scene_grasps)

    over = {"region.center_num": args.center_num,
            "region.num_points": args.num_points}
    if args.fast:
        over.update({"model.fps_groups": 8, "region.center_fps_groups": 8,
                     "region.slab_cell": 0.04})
    cfg = infer_config(**over)
    model = REGNet(cfg, dtype=jnp.bfloat16 if args.fast else None)
    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))
    g = cfg.gripper

    variables, epoch = ckpt.load_weights_npz(args.weights)
    print(f"weights {args.weights} (epoch {epoch}) "
          f"config={'fast' if args.fast else 'exact'}")

    names = [n for n in (args.only.split(",") if args.only else CORRUPTIONS)
             if n]
    scenes = []
    for i in range(args.scenes):
        seed = args.scene_seed0 + i
        s = make_synthetic_scene(seed, num_view=args.num_points,
                                 view_index=i % 4, color_mode="coherent")
        scenes.append((seed, i % 4, s))

    print(f"{'corruption':10s} " + " ".join(
        f"s{seed}" for seed, *_ in scenes) + "   mean_vgr mean_anti mean_n")
    for name in names:
        kw = CORRUPTIONS[name]
        vgrs, antis, counts = [], [], []
        for si, (seed, view_idx, s) in enumerate(scenes):
            rng = np.random.RandomState(10_000 + si)
            zshift = kw.get("zshift", 0.0)
            noise_kw = {k: v for k, v in kw.items() if k != "zshift"}
            cloud, sel = kinect_corrupt(
                s["view_cloud"], np.asarray(_CAMERA_POSE[view_idx],
                                            np.float64), rng,
                return_index=True, **noise_kw)
            if zshift:
                cloud = cloud + np.float32([0.0, 0.0, zshift])
            pc = np.c_[cloud, s["view_cloud_color"][sel]].astype(
                np.float32)[None]
            out = fwd(variables, jnp.asarray(pc),
                      jax.random.PRNGKey(1000 + si))
            grasps = extract_grasp_sets(out)[0]["grasp_stage3_score"]
            if zshift and len(grasps):
                grasps = grasps.copy()
                grasps[:, 2] -= zshift   # undo for clean-geometry eval
            if len(grasps) == 0:
                vgrs.append(0.0); antis.append(0.0); counts.append(0)
                continue
            rec = evaluate_scene_grasps(
                s, grasps, view_idx, g.table_height, g.depth, g.width, g,
                cfg.eval)
            vgrs.append(rec.vgr); antis.append(rec.score)
            counts.append(len(grasps))
        print(f"{name:10s} " + " ".join(f"{v:.2f}" for v in vgrs)
              + f"   {np.mean(vgrs):8.3f} {np.mean(antis):9.3f} "
              f"{np.mean(counts):6.0f}", flush=True)


if __name__ == "__main__":
    main()
