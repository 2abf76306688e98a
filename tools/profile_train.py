"""Per-stage training-step breakdown (the backward-pass analogue of
tools/profile_stages.py — VERDICT r2 item 9).

Times, at the training preset (batch B, 25.6k points, center_num 64):

  * ScoreNet forward alone and forward+backward (param grads),
  * the full 3-stage loss forward alone and forward+backward,
  * the Adam update in isolation,
  * each of the above with --remat (backbone rematerialization),

so backward cost attributes to a stage instead of one opaque step
number.  Amortized >=10 dispatches, scalar-fetch sync (relay timing
rules in CLAUDE.md).

Usage: python tools/profile_train.py [--batch 8] [--iters 10] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(name, fn, *args, iters=10):
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (training experiment; "
                        "quality-gate on the frozen suite before "
                        "adopting)")
    p.add_argument("--slab-cell", type=float, default=0.0,
                   help="sorted-slab geometry kernels in the train "
                        "forward (0.04 = the A/B'd serving setting)")
    p.add_argument("--fps-groups", type=int, default=1,
                   help="stratified approximate FPS (model.fps_groups)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    import dataclasses

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.data.dataset import pad_gt_grasps
    from regnet_for_3d_grasping_tpu.models import REGNet, ScoreNet
    from regnet_for_3d_grasping_tpu.train import trainer
    from regnet_for_3d_grasping_tpu.train.losses import regnet_losses
    from regnet_for_3d_grasping_tpu.geometry.gt import match_centers_to_gt
    from regnet_for_3d_grasping_tpu.utils.config import train_config

    overrides = {}
    if args.slab_cell > 0.0:
        overrides["region.slab_cell"] = args.slab_cell
    if args.fps_groups > 1:
        overrides["model.fps_groups"] = args.fps_groups
    cfg = train_config(**overrides)
    dtype = jnp.bfloat16 if args.bf16 else None
    print(f"device={jax.devices()[0]}  batch={args.batch}  "
          f"dtype={'bf16' if args.bf16 else 'f32'}  "
          f"slab={args.slab_cell}  fpsG={args.fps_groups}")

    scenes = [make_synthetic_scene(i, num_view=cfg.region.num_points)
              for i in range(2)]
    pcs, scores, frames, gscores, valids = [], [], [], [], []
    for i in range(args.batch):
        s = scenes[i % len(scenes)]
        pcs.append(np.c_[s["view_cloud"], s["view_cloud_color"]])
        scores.append(np.tanh(s["view_cloud_score"]))
        f, sc, v = pad_gt_grasps(s, cfg.region.max_gt_grasps)
        frames.append(f)
        gscores.append(sc)
        valids.append(v)
    batch = trainer.DeviceBatch(
        pc=jnp.asarray(np.stack(pcs).astype(np.float32)),
        score=jnp.asarray(np.stack(scores).astype(np.float32)),
        gt_frames=jnp.asarray(np.stack(frames)),
        gt_scores=jnp.asarray(np.stack(gscores)),
        gt_valid=jnp.asarray(np.stack(valids)))

    def variants():
        yield "", cfg
        yield "remat", dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_backbone=True))

    it = args.iters
    for tag, vcfg in variants():
        suffix = f" [{tag}]" if tag else ""
        model = REGNet(vcfg, dtype=dtype)
        snet = ScoreNet(vcfg.model, dtype=dtype)
        opt = trainer.make_optimizer(vcfg, steps_per_epoch=100)
        state = trainer.init_state(model, vcfg, opt, batch.pc)
        svars = {"params": {"score_net": state.params["score_net"]},
                 "batch_stats": {"score_net":
                                 state.batch_stats["score_net"]}}

        bench(f"ScoreNet fwd{suffix}",
              lambda v, x: snet.apply(
                  {"params": v["params"]["score_net"],
                   "batch_stats": v["batch_stats"]["score_net"]}, x),
              svars, batch.pc, iters=it)

        def score_loss(params, v, x):
            feat, sc = snet.apply(
                {"params": params, "batch_stats":
                 v["batch_stats"]["score_net"]}, x)
            return jnp.sum(feat.astype(jnp.float32)) \
                + jnp.sum(sc.astype(jnp.float32))

        bench(f"ScoreNet fwd+bwd{suffix}",
              lambda v, x: jax.grad(score_loss)(
                  v["params"]["score_net"], v, x),
              svars, batch.pc, iters=it)

        def full_loss(params, st, b, key):
            out, _ = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                b.pc, train=True, with_refine=True,
                rngs={"sampling": key, "dropout": key},
                mutable=["batch_stats"])
            grasp_gt, matched = match_centers_to_gt(
                out.centers[..., :3], b.gt_frames, b.gt_scores,
                b.gt_valid, vcfg.region.gt_match_dist2)
            total, _ = regnet_losses(out, b.score, grasp_gt, matched,
                                     vcfg)
            return total

        key = jax.random.PRNGKey(0)
        bench(f"full 3-stage loss fwd{suffix}",
              lambda st, b, k: full_loss(st.params, st, b, k),
              state, batch, key, iters=it)
        bench(f"full 3-stage loss fwd+bwd{suffix}",
              lambda st, b, k: jax.grad(full_loss)(st.params, st, b, k),
              state, batch, key, iters=it)

        grads = jax.jit(lambda st, b, k: jax.grad(full_loss)(
            st.params, st, b, k))(state, batch, key)
        bench(f"optimizer update{suffix}",
              lambda g, st: opt.update(g, st.opt_state, st.params),
              grads, state, iters=it)

        step = trainer.make_train_step(model, opt, vcfg, stage="refine")
        st2, m = step(state, batch, key)
        jax.block_until_ready(m["loss_total"])
        t0 = time.perf_counter()
        for i in range(it):
            st2, m = step(st2, batch, jax.random.PRNGKey(i))
        float(m["loss_total"])
        dt = (time.perf_counter() - t0) / it * 1000
        print(f"{'FULL train step' + suffix:52s} {dt:8.2f} ms   "
              f"({args.batch / (dt / 1000):.1f} clouds/s)")
        print()


if __name__ == "__main__":
    main()
