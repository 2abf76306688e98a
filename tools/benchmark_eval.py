"""Canonical quality metrics on the frozen benchmark scene suite.

Runs a checkpoint through the full cascade on every scene of the
versioned suite (data/benchmark_suite.py), verifies each generated scene
against the committed SHA-256 fingerprints, and writes ONE metrics file
``docs/evidence/metrics_r{N}.json`` — so quality across rounds is a
diff, not a narrative (r2 review weak item 3; the reference's analogue
is its committed test_file goldens, test.py:143-148).

With ``--real-clouds`` the SAME configured forward also runs the two
real Kinect clouds the reference commits
(test_file/real_data_predict/000{0,1}_cloud.p) and records their
view-collision survival funnels (eval/collision.view_check_funnel)
next to the synthetic metrics — so every approximation knob
(slab cell, fps groups, bf16, accept margin) is gated on BOTH
distributions in one command (VERDICT r4 item 3).

Usage:
  python tools/benchmark_eval.py --checkpoint assets/models/r2_jitter \
      --round 3 [--epoch 99] [--center-num 4000] [--bf16] [--cpu] \
      [--real-clouds]
  python tools/benchmark_eval.py --verify-only     # fingerprint check
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="assets/models/r2_jitter")
    p.add_argument("--epoch", type=int, default=-1,
                   help="-1 = latest available")
    p.add_argument("--round", type=int, default=0,
                   help="round number for the metrics filename; 0 = "
                        "print only, don't write")
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--accept-margin", type=float, default=0.0)
    p.add_argument("--fps-groups", type=int, default=1,
                   help="stratified approximate FPS at SA1 (1 = exact); "
                        "used for the quality gate of ops/fps.py groups")
    p.add_argument("--center-fps-groups", type=int, default=1)
    p.add_argument("--slab-cell", type=float, default=0.0,
                   help="sorted-slab kernels cell size (0 = full scans); "
                        "quality gate for ops/slab.py")
    p.add_argument("--center-select", default="fps",
                   choices=["fps", "bucket"],
                   help="center-selection algorithm under test "
                        "(region.center_select)")
    p.add_argument("--refine-pose", default="full",
                   choices=["full", "center", "off"],
                   help="refinement-ablation knob under test "
                        "(region.refine_pose)")
    p.add_argument("--center-min-z", type=float, default=None,
                   help="above-plane center prior "
                        "(RegionConfig.center_min_z)")
    p.add_argument("--pose-search", type=int, default=0,
                   help="theta-grid pose search K "
                        "(RegionConfig.pose_search_k)")
    p.add_argument("--refine-guard", action="store_true",
                   help="survivor-preserving refinement "
                        "(RegionConfig.refine_guard)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--verify-only", action="store_true")
    p.add_argument("--real-clouds", action="store_true",
                   help="also run the reference's two committed real "
                        "Kinect clouds through the same configured "
                        "forward and record their survival funnels")
    p.add_argument("--real-only", action="store_true",
                   help="skip the synthetic suite (quick real-cloud "
                        "check of a config); implies --real-clouds")
    p.add_argument("--suite-version", type=int, default=0,
                   help="0 = current SUITE_VERSION; 1 = the iid-color "
                        "suite rounds 1-3 were gated on")
    p.add_argument("--out-suffix", default="",
                   help="metrics filename suffix, e.g. '_exact'")
    args = p.parse_args()

    from regnet_for_3d_grasping_tpu.data.benchmark_suite import (
        SUITE_VERSION, generate_scene, load_fingerprints, suite_specs,
        verify_scene)

    suite_version = args.suite_version or SUITE_VERSION
    specs = suite_specs(suite_version)
    fps = load_fingerprints(suite_version)
    assert fps["suite_version"] == suite_version

    if args.verify_only:
        for spec in specs:
            verify_scene(spec, generate_scene(spec), fps)
        print(f"suite v{suite_version}: all {len(specs)} scene "
              f"fingerprints verified")
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.config import infer_config
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets
    from regnet_for_3d_grasping_tpu.eval.evaluator import (
        EvalRecord, evaluate_scene_grasps)

    cfg = infer_config(**{
        "region.center_num": args.center_num,
        "region.accept_margin": args.accept_margin,
        "model.fps_groups": args.fps_groups,
        "region.center_fps_groups": args.center_fps_groups,
        "region.slab_cell": args.slab_cell,
        "region.center_select": args.center_select,
        "region.refine_pose": args.refine_pose,
        "region.center_min_z": args.center_min_z,
        "region.pose_search_k": args.pose_search,
        "region.refine_guard": args.refine_guard,
    })
    model = REGNet(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))
    g = cfg.gripper

    if args.checkpoint.endswith(".npz"):
        # git-tracked weight artifact (survives the per-round assets wipe)
        variables, epoch = ckpt.load_weights_npz(args.checkpoint)
    else:
        epoch = args.epoch if args.epoch >= 0 else \
            ckpt.latest_epoch(args.checkpoint)
        restored, _ = ckpt.restore_checkpoint(args.checkpoint, epoch=epoch)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}

    stage_keys = {"stage2": "grasp_stage2", "stage3": "grasp_stage3",
                  "stage3_score": "grasp_stage3_score"}
    per_scene = {}
    totals = {r: {s: EvalRecord() for s in stage_keys}
              for r in ("sparse", "clutter")}
    for i, spec in enumerate(specs if not args.real_only else []):
        scene = generate_scene(spec)
        verify_scene(spec, scene, fps)
        pc = jnp.asarray(np.c_[scene["view_cloud"],
                               scene["view_cloud_color"]].astype(
                                   np.float32)[None])
        out = fwd(variables, pc, jax.random.PRNGKey(7000 + i))
        sets = extract_grasp_sets(out)[0]
        row = {}
        for sname, skey in stage_keys.items():
            grasps = sets[skey]
            if len(grasps) == 0:
                rec = EvalRecord()
            else:
                rec = evaluate_scene_grasps(
                    scene, grasps, spec["view_index"], g.table_height,
                    np.full(len(grasps), g.depth, np.float32), g.width,
                    g, cfg.eval)
            totals[spec["regime"]][sname] = \
                totals[spec["regime"]][sname].add(rec)
            row[sname] = {"vgr": round(rec.vgr, 4),
                          "antipodal": round(rec.score, 4),
                          "n_grasps": int(rec.formal)}
        per_scene[spec["name"]] = row
        print(f"{spec['name']:12s} "
              + " ".join(f"{s}: vgr={row[s]['vgr']:.3f} "
                         f"n={row[s]['n_grasps']}"
                         for s in ("stage3_score",)))

    summary = {}
    for regime, recs in totals.items():
        summary[regime] = {
            s: {"vgr": round(r.vgr, 4), "vgr_before": round(r.vgr_before, 4),
                "antipodal": round(r.score, 4), "n_grasps": int(r.formal)}
            for s, r in recs.items()}
        print(f"[{regime}] stage3_score VGR "
              f"{recs['stage3_score'].vgr:.4f} antipodal "
              f"{recs['stage3_score'].score:.4f} over "
              f"{int(recs['stage3_score'].formal)} grasps")

    real = None
    if args.real_clouds or args.real_only:
        real = _real_cloud_funnels(fwd, variables, cfg)
        for name, entry in real.items():
            o3 = entry["funnel"].get("ours_grasp_stage3", {})
            print(f"[real {name}] stage3 survive "
                  f"{o3.get('survive', 0)}/{o3.get('total', 0)}  "
                  f"stage2 survive "
                  f"{entry['funnel']['ours_grasp_stage2'].get('survive', 0)}"
                  f"/{entry['funnel']['ours_grasp_stage2'].get('total', 0)}"
                  f"  reference "
                  f"{entry['funnel']['reference_grasp_stage3']['survive']}"
                  f"/{entry['funnel']['reference_grasp_stage3']['total']}")

    result = {
        "suite_version": suite_version,
        "round": args.round,
        "checkpoint": os.path.relpath(args.checkpoint, REPO)
        if os.path.isabs(args.checkpoint) else args.checkpoint,
        "epoch": int(epoch),
        "config": {"center_num": args.center_num,
                   "accept_margin": args.accept_margin,
                   "fps_groups": args.fps_groups,
                   "center_fps_groups": args.center_fps_groups,
                   "slab_cell": args.slab_cell,
                   "center_select": args.center_select,
                   "refine_pose": args.refine_pose,
                   "center_min_z": args.center_min_z,
                   "pose_search_k": args.pose_search,
                   "refine_guard": args.refine_guard,
                   "dtype": "bf16" if args.bf16 else "f32",
                   "normals": "precomputed(scene_normal)",
                   "backend": jax.default_backend()},
        "summary": summary,
        "per_scene": per_scene,
    }
    if real is not None:
        result["real_clouds"] = real
    if args.round:
        path = os.path.join(REPO, "docs", "evidence",
                            f"metrics_r{args.round:02d}"
                            f"{args.out_suffix}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    else:
        print(json.dumps(result["summary"], indent=1))


def _real_cloud_funnels(fwd, variables, cfg) -> dict:
    """Run the committed real Kinect clouds through the configured
    forward; return their view-collision survival funnels.

    Input preprocessing matches cli/infer.py's real-data path applied to
    the golden pickles (the stored ``points`` are the post-crop
    global-frame cloud, test.py:114-121): color noise, then a seeded
    resample to the model's point budget.  The funnel matches
    tools/real_data_evidence.py (table 0.75, table_sign=+1,
    require_close_region=False — the reference's eval_test settings)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.eval.collision import view_check_funnel
    from regnet_for_3d_grasping_tpu.utils.config import (
        EvalConfig, GripperConfig)
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets

    ref_dir = "/root/reference/test_file/real_data_predict"
    g = GripperConfig()

    def funnel(points, grasps):
        masks = view_check_funnel(
            jnp.asarray(points[:, :3], jnp.float32),
            jnp.asarray(np.asarray(grasps)[:, :8], jnp.float32),
            g.table_height, g.depth, g, EvalConfig(), table_sign=+1.0)
        out = {k: int(np.asarray(v).sum()) for k, v in masks.items()}
        out["total"] = int(len(grasps))
        return out

    report = {}
    for ci, name in enumerate(("0000_cloud", "0001_cloud")):
        with open(os.path.join(ref_dir, name + ".p"), "rb") as f:
            golden = pickle.load(f)
        pts = np.asarray(golden["points"], np.float32)
        cols = np.asarray(golden["colors"], np.float32)

        rng = np.random.RandomState(1)
        cols = cols * (1 - rng.rand(3) / 5)          # utils.py:426-431
        sel = rng.choice(len(pts), cfg.region.num_points,
                         replace=len(pts) < cfg.region.num_points)
        pc = np.c_[pts[sel], cols[sel]].astype(np.float32)[None]

        out = fwd(variables, jnp.asarray(pc), jax.random.PRNGKey(9900 + ci))
        sets = extract_grasp_sets(out)[0]

        entry = {"funnel": {}}
        for key in ("grasp_stage2", "grasp_stage3"):
            if len(sets[key]):
                entry["funnel"]["ours_" + key] = funnel(pts, sets[key])
            else:
                entry["funnel"]["ours_" + key] = {"survive": 0, "total": 0}
        entry["funnel"]["reference_grasp_stage3"] = funnel(
            pts, golden["grasp_stage3"])
        report[name] = entry
    return report


if __name__ == "__main__":
    main()
