"""Headline benchmark: end-to-end SN->GRN->RN inference clouds/sec.

Runs the full REGNet cascade at the reference's inference configuration of
record (test.py:61-81: 25,600 points/cloud, center_num=4000,
group_num_more=2048) on the attached TPU chip and prints ONE JSON line.

`vs_baseline` compares against 1.0 clouds/sec — a deliberately generous
*cap* on the reference's single-GPU end-to-end rate (the repo publishes
no numbers, BASELINE.md).  Measured grounding
(tools/benchmark_reference_floor.py, behavioral re-statements of the
reference's host-side Python loops with torch-CPU tensors): region
grouping 2.96 s/cloud + closing-region crop 0.22 + per-grasp collision
eval 0.90 = a composite 4.08 s/cloud BEFORE any network forward, i.e.
the reference is bounded above by ~0.245 clouds/sec
(BASELINE.md "measured reference component times").  vs_baseline
therefore understates the true speedup by >=4x; the 1.0 denominator is
kept for round-over-round continuity of the metric series.  The build
target is >=5x (BASELINE.json north star), i.e. vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_CLOUDS_PER_SEC = 1.0   # documented estimate, see module docstring
WARMUP = 3
ITERS = 40   # amortize axon-relay dispatch jitter (10 iters showed +/-3%)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1,
                   help="clouds per dispatch (throughput A/B; the "
                        "driver's headline stays the default)")
    p.add_argument("--fps-groups", type=int, default=8,
                   help="stratified-FPS group count A/B (default 8 = "
                        "the quality-gated serving config)")
    p.add_argument("--slab-cell", type=float, default=0.04,
                   help="sorted-slab cell size A/B (0 = exact full "
                        "scans; default 0.04 = the serving config)")
    p.add_argument("--center-select", default="fps",
                   choices=["fps", "bucket"],
                   help="center-selection A/B: 'bucket' replaces the "
                        "sequential stratified FPS with a one-pass "
                        "stratified best-score pick (quality-gate before "
                        "adopting)")
    p.add_argument("--no-train", action="store_true",
                   help="skip the training-throughput field (the "
                        "inference headline is unaffected)")
    p.add_argument("--train-batch", type=int, default=15,
                   help="batch for the training-throughput field (15 = "
                        "the reference's config of record, README.md:60)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils.config import infer_config

    # The serving configuration: bf16 network compute with all geometry
    # pinned to f32 Precision.HIGHEST (ops/distances.py et al), sorted-
    # slab kernels (ops/slab.py) for SA1 ball query / FP3 3-NN / region
    # grouping / closing-region crop, and stratified grouped FPS (G=8).
    # Quality is gated on the frozen benchmark suite
    # (docs/evidence/metrics_r03.json): stage-3 VGR 0.966/0.972
    # (sparse/clutter) vs 0.933/0.947 for the exact-semantics config
    # (docs/evidence/metrics_r03_exact.json).
    cfg = infer_config(**{"region.slab_cell": args.slab_cell,
                          "model.fps_groups": args.fps_groups,
                          "region.center_fps_groups": args.fps_groups,
                          "region.center_select": args.center_select})
    model = REGNet(cfg, dtype=jnp.bfloat16)

    scenes = [make_synthetic_scene(i, num_view=cfg.region.num_points)
              for i in range(args.batch)]
    pc = np.stack([np.c_[s["view_cloud"], s["view_cloud_color"]]
                   for s in scenes]).astype(np.float32)
    pc = jnp.asarray(pc)

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, pc))()

    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))

    for i in range(WARMUP):
        jax.block_until_ready(fwd(variables, pc, jax.random.PRNGKey(i)))

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fwd(variables, pc, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    clouds_per_sec = ITERS * args.batch / dt
    batch_tag = f", batch {args.batch}" if args.batch > 1 else ""
    # "exact" only when BOTH approximations are off (slab grid and
    # stratified FPS) — fpsG>1 alone is still an approximation
    if args.slab_cell:
        slab_tag = f"slab{args.slab_cell:g}+"
    elif args.fps_groups == 1:
        slab_tag = "exact+"
    else:
        slab_tag = "slab-off+"

    cs_tag = "+bucketCS" if args.center_select == "bucket" else ""
    record = {
        "metric": "clouds/sec end-to-end SN->GRN->RN inference @25.6k pts "
                  f"(center_num=4000, bf16+{slab_tag}"
                  f"fpsG{args.fps_groups}{cs_tag} serving config"
                  f"{batch_tag})",
        "value": round(clouds_per_sec, 4),
        "unit": "clouds/sec",
        "dtype": "bf16",
        "vs_baseline": round(clouds_per_sec / REF_CLOUDS_PER_SEC, 4),
    }

    # MFU framing (VERDICT r4 item 4): analytic MXU work per cloud
    # (tools/flops.py) x measured rate / v5e bf16 peak.  The cascade is
    # geometry(VPU)-heavy by design, so low MFU is expected — the field
    # makes the framing auditable round-over-round.
    try:
        import importlib.util as _ilu
        import os as _os
        spec = _ilu.spec_from_file_location(
            "flops", _os.path.join(_os.path.dirname(
                _os.path.abspath(__file__)), "tools", "flops.py"))
        flops = _ilu.module_from_spec(spec)
        spec.loader.exec_module(flops)
        macs = (sum(flops.backbone_macs(cfg).values())
                + sum(flops.head_macs(cfg).values()))
        record["gflop_per_cloud"] = round(2 * macs / 1e9, 1)
        record["mfu_bf16_v5e_pct"] = round(
            100 * 2 * macs * clouds_per_sec / 197e12, 2)
    except Exception:                               # pragma: no cover
        pass

    # training throughput (VERDICT r4 item 5): full jitted 3-stage train
    # step (forward+backward+Adam) at the reference's batch-15 config of
    # record, same serving approximations as the r4+ training runs
    if not args.no_train:
        try:
            record["train_clouds_per_sec"] = _train_rate(
                args.train_batch, args.slab_cell, args.fps_groups)
            record["train_batch"] = args.train_batch
        except Exception as e:                      # pragma: no cover
            import sys
            print(f"train-rate measurement failed: {e!r}",
                  file=sys.stderr)

    print(json.dumps(record))


def _train_rate(batch: int, slab_cell: float, fps_groups: int,
                iters: int = 8) -> float:
    """Measured clouds/sec of the jitted train step (bf16 + the serving
    geometry approximations, matching the r4/r5 training runs of
    record)."""
    import time

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.data.dataset import pad_gt_grasps
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.train import trainer
    from regnet_for_3d_grasping_tpu.utils.config import train_config

    overrides = {}
    if slab_cell > 0.0:
        overrides["region.slab_cell"] = slab_cell
    if fps_groups > 1:
        overrides["model.fps_groups"] = fps_groups
    cfg = train_config(**overrides)

    scenes = [make_synthetic_scene(50 + i,
                                   num_view=cfg.region.num_points)
              for i in range(batch)]
    gts = [pad_gt_grasps(s, cfg.region.max_gt_grasps) for s in scenes]
    dbatch = trainer.DeviceBatch(
        pc=jnp.asarray(np.stack(
            [np.c_[s["view_cloud"], s["view_cloud_color"]]
             for s in scenes]).astype(np.float32)),
        score=jnp.asarray(np.stack(
            [np.tanh(s["view_cloud_score"]) for s in scenes]
        ).astype(np.float32)),
        gt_frames=jnp.asarray(np.stack([g[0] for g in gts])),
        gt_scores=jnp.asarray(np.stack([g[1] for g in gts])),
        gt_valid=jnp.asarray(np.stack([g[2] for g in gts])),
    )

    model = REGNet(cfg, dtype=jnp.bfloat16)
    optimizer = trainer.make_optimizer(cfg, steps_per_epoch=100)
    state = trainer.init_state(model, cfg, optimizer, dbatch.pc)
    step = trainer.make_train_step(model, optimizer, cfg, stage="refine")

    key = jax.random.PRNGKey(0)
    for i in range(2):                               # compile + warm
        state, metrics = step(state, dbatch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, dbatch,
                              jax.random.fold_in(key, 10 + i))
    float(metrics["loss_total"])                     # scalar sync
    dt = time.perf_counter() - t0
    return round(iters * batch / dt, 4)


def _is_transient(exc: BaseException) -> bool:
    """Only relay/remote-compile hiccups are retryable — a genuine model
    failure (shape error, assertion, NaN guard) must fail the bench run.

    The axon relay surfaces transport problems as XlaRuntimeError /
    connection-level OSErrors; Python-level model bugs surface as
    ValueError/TypeError/AssertionError and propagate.
    """
    transient_types = (ConnectionError, TimeoutError, OSError)
    if isinstance(exc, transient_types):
        return True
    name = type(exc).__name__
    return name in ("XlaRuntimeError", "RpcError", "_InactiveRpcError")


def run(fn=main):
    try:
        fn()
    except Exception as e:
        if not _is_transient(e):
            raise
        # transient remote-compile/relay hiccup under helper contention;
        # one retry keeps the driver's bench record intact
        import traceback
        traceback.print_exc()
        fn()


if __name__ == "__main__":
    run()
