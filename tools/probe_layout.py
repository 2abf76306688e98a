"""Controlled probe: scene-LAYOUT domain shift of a checkpoint.

tools/probe_sensor_noise.py (docs/evidence/probe_sensor_noise_r5.txt)
showed the r4 checkpoint is FLAT under published Kinect-v1 noise
magnitudes — per its decision rule the remaining real-data gap
(16/3058 funnel survivors vs the reference's 416/555,
docs/evidence/real_data_r4_retrained.json) is layout/domain shift,
not sensor noise.  The measured layout deltas between our r1-r4
training distribution and the reference's committed clouds:

                      ours (origin)   real 0000/0001      ref virtual
  table point frac    ~50%            82% / 92%           94%
  table z             exactly 0.75    0.695 / 0.762       0.49
  workspace center    (0, 0)          (-0.07, 0.42)       (0, 0)
  below-table points  none            5.3% / 0%           0%
  ungraspable objects none            several             —

PointNet++ consumes ABSOLUTE xyz, so none of these are invariances.
This probe re-stages synthetic scenes one factor at a time
(make_synthetic_scene layout kwargs), runs the cascade, and reports
VGR/antipodal plus the score head's table-vs-object separation.  The
factor(s) that crash VGR or collapse the score separation are what the
round-5 retrain's `layout="randomized"` distribution must cover.

Usage:
  python tools/probe_layout.py --weights weights/r4_coherent_e100.npz
      [--scenes 4] [--center-num 4000] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


# single-factor restagings + the combined real-like layout
LAYOUTS = {
    "base":     {},
    "objfrac":  {"obj_frac": 0.12},
    "extent":   {"table_extent": (0.55, 0.50)},
    "tz70":     {"table_z": 0.70},
    "tz49":     {"table_z": 0.49},
    "offset":   {"xy_offset": (-0.07, 0.42)},
    "yaw":      {"yaw": 1.2},
    "floor":    {"floor_frac": 0.05},
    "distract": {"distractors": 2},
    "realish":  {"obj_frac": 0.12, "table_extent": (0.55, 0.50),
                 "table_z": 0.70, "xy_offset": (-0.07, 0.42),
                 "floor_frac": 0.05, "distractors": 2},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="weights/r4_coherent_e100.npz")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--scene-seed0", type=int, default=9500)
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--fast", action="store_true")
    p.add_argument("--only", type=str, default="")
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

    names = [n for n in (args.only.split(",") if args.only else LAYOUTS)
             if n]
    hdr = " ".join(f"s{args.scene_seed0 + i}" for i in range(args.scenes))
    print(f"{'layout':9s} {hdr}   mean_vgr mean_anti mean_n "
          "tbl_score obj_score")
    for name in names:
        kw = LAYOUTS[name]
        vgrs, antis, counts, tscores, oscores = [], [], [], [], []
        for si in range(args.scenes):
            seed = args.scene_seed0 + si
            s = make_synthetic_scene(seed, num_view=args.num_points,
                                     view_index=si % 4,
                                     color_mode="coherent", **kw)
            pc = np.c_[s["view_cloud"],
                       s["view_cloud_color"]].astype(np.float32)[None]
            out = fwd(variables, jnp.asarray(pc),
                      jax.random.PRNGKey(2000 + si))
            pred = np.asarray(out.score[0])
            lbl = s["view_cloud_label"]
            tz = s.get("table_height", g.table_height)
            tscores.append(float(pred[lbl == 0].mean()))
            oscores.append(float(pred[lbl > 0].mean()))
            grasps = extract_grasp_sets(out)[0]["grasp_stage3_score"]
            if len(grasps) == 0:
                vgrs.append(0.0); antis.append(0.0); counts.append(0)
                continue
            rec = evaluate_scene_grasps(
                s, grasps, si % 4, tz, g.depth, g.width, g, cfg.eval)
            vgrs.append(rec.vgr); antis.append(rec.score)
            counts.append(len(grasps))
        print(f"{name:9s} " + " ".join(f"{v:.2f}" for v in vgrs)
              + f"   {np.mean(vgrs):8.3f} {np.mean(antis):9.3f} "
              f"{np.mean(counts):6.0f} {np.mean(tscores):9.3f} "
              f"{np.mean(oscores):9.3f}", flush=True)


if __name__ == "__main__":
    main()
