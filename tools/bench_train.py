"""Training-step throughput benchmark (secondary perf line).

Measures the full three-stage jitted train step (forward + backward +
Adam update) at the reference training preset (25.6k points, batch N,
center_num 64) on the attached device and prints one JSON line:

  {"metric": "train clouds/sec ...", "value": ..., "unit": "clouds/sec"}

bench.py stays the driver's single headline (inference); this is the
training number for README's performance table.

Usage: python tools/bench_train.py [--batch 8] [--remat] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (params stay f32)")
    p.add_argument("--slab-cell", type=float, default=0.0,
                   help="sorted-slab geometry kernels in the train "
                        "forward (0.04 = the A/B'd serving setting)")
    p.add_argument("--fps-groups", type=int, default=1,
                   help="stratified approximate FPS (model.fps_groups)")
    args = p.parse_args()

    import jax

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.data.dataset import pad_gt_grasps
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.train import trainer
    from regnet_for_3d_grasping_tpu.utils.config import train_config

    overrides = {}
    if args.slab_cell > 0.0:
        overrides["region.slab_cell"] = args.slab_cell
    if args.fps_groups > 1:
        overrides["model.fps_groups"] = args.fps_groups
    cfg = train_config(**overrides)
    if args.remat:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_backbone=True))

    scenes = [make_synthetic_scene(i, num_view=cfg.region.num_points)
              for i in range(2)]
    rng = np.random.RandomState(0)

    def build(scene_ids):
        pcs, scores, frames, gscores, valids = [], [], [], [], []
        for i in scene_ids:
            s = scenes[i % len(scenes)]
            pcs.append(np.c_[s["view_cloud"], s["view_cloud_color"]])
            scores.append(np.tanh(s["view_cloud_score"]))
            f, sc, v = pad_gt_grasps(s, cfg.region.max_gt_grasps)
            frames.append(f)
            gscores.append(sc)
            valids.append(v)
        return trainer.DeviceBatch(
            pc=np.stack(pcs).astype(np.float32),
            score=np.stack(scores).astype(np.float32),
            gt_frames=np.stack(frames), gt_scores=np.stack(gscores),
            gt_valid=np.stack(valids))

    import jax.numpy as jnp
    batch = jax.tree.map(jnp.asarray, build(range(args.batch)))

    model = REGNet(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    opt = trainer.make_optimizer(cfg, steps_per_epoch=100)
    state = trainer.init_state(model, cfg, opt, batch.pc)
    step = trainer.make_train_step(model, opt, cfg, stage="refine")

    state, metrics = step(state, batch, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
    # sync via a scalar fetch (relay-safe, see CLAUDE.md)
    _ = float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / args.iters

    tags = [t for t, on in (
        ("remat", args.remat), ("bf16", args.bf16),
        (f"slab{args.slab_cell}", args.slab_cell > 0),
        (f"fpsG{args.fps_groups}", args.fps_groups > 1)) if on]
    print(json.dumps({
        "metric": f"train clouds/sec (3-stage step, batch {args.batch}, "
                  f"25.6k pts, center_num 64"
                  + (", " + ",".join(tags) if tags else "") + ")",
        "value": round(args.batch / dt, 4),
        "unit": "clouds/sec",
        "step_ms": round(dt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
