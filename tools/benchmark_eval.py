"""Canonical quality metrics on the frozen benchmark scene suite.

Runs a checkpoint through the full cascade on every scene of the
versioned suite (data/benchmark_suite.py), verifies each generated scene
against the committed SHA-256 fingerprints, and writes ONE metrics file
``docs/evidence/metrics_r{N}.json`` — so quality across rounds is a
diff, not a narrative (r2 review weak item 3; the reference's analogue
is its committed test_file goldens, test.py:143-148).

Usage:
  python tools/benchmark_eval.py --checkpoint assets/models/r2_jitter \
      --round 3 [--epoch 99] [--center-num 4000] [--bf16] [--cpu]
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
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--verify-only", action="store_true")
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
    for i, spec in enumerate(specs):
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
                   "dtype": "bf16" if args.bf16 else "f32",
                   "normals": "precomputed(scene_normal)",
                   "backend": jax.default_backend()},
        "summary": summary,
        "per_scene": per_scene,
    }
    if args.round:
        path = os.path.join(REPO, "docs", "evidence",
                            f"metrics_r{args.round:02d}"
                            f"{args.out_suffix}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    else:
        print(json.dumps(result["summary"], indent=1))


if __name__ == "__main__":
    main()
