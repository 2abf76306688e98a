"""On-device grasp evaluation A/B (VERDICT r4 item 7, on-chip branch).

The reference evaluates predicted grasps in a host loop
(`dataset_utils/eval_score/eval_utils/evaluation_data_generator.py`,
driven per-scene from utils.py:357-388) — measured at **0.90 s/cloud**
for the collision pass alone on this box
(tools/benchmark_reference_floor.py).  Our evaluator
(`eval/collision.view_check_funnel`) is jittable fixed-shape JAX, so the
per-scene eval loop can ride the SAME device dispatch as the serving
cascade — one fused jit, no host round-trip, and under DP serving
(parallel/infer.py) it shards over chips with the clouds.

This tool measures, on the attached chip at the serving config:

  * cascade forward alone              (bench.py's headline path)
  * cascade + full view-collision funnel over all NC refined grasps
    fused into one jit

and reports the on-device eval delta per cloud vs the reference's
0.90 s/cloud host floor.

Usage: python tools/ab_eval_ondevice.py [--iters 30] [--center-num 4000]
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

REF_HOST_EVAL_SEC_PER_CLOUD = 0.90   # benchmark_reference_floor.py


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--center-num", type=int, default=4000)
    p.add_argument("--slab-cell", type=float, default=0.04)
    p.add_argument("--fps-groups", type=int, default=8)
    p.add_argument("--table-height", type=float, default=0.75)
    p.add_argument("--tiny", action="store_true",
                   help="tiny shapes (CPU smoke tests)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.eval.collision import view_check_funnel
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.utils.config import (
        EvalConfig, GripperConfig, infer_config, tiny_config)

    overrides = {"region.slab_cell": args.slab_cell,
                 "model.fps_groups": args.fps_groups}
    if args.tiny:
        cfg = tiny_config(**overrides)
    else:
        overrides["region.center_num"] = args.center_num
        cfg = infer_config(**overrides)
    model = REGNet(cfg, dtype=jnp.bfloat16)
    gripper = GripperConfig()
    ecfg = EvalConfig()

    scene = make_synthetic_scene(0, num_view=cfg.region.num_points)
    pc = jnp.asarray(np.c_[scene["view_cloud"],
                           scene["view_cloud_color"]][None]
                     .astype(np.float32))

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, pc))()

    fwd = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))

    def fwd_eval(v, x, k):
        out = model.apply(v, x, train=False, rngs={"sampling": k})
        # full funnel over every refined proposal (depth = gripper depth,
        # the serving export's setting) — geometry stays f32
        masks = view_check_funnel(
            x[0, :, :3], out.final_grasps[0].astype(jnp.float32),
            args.table_height, gripper.depth, gripper, ecfg)
        # survivors among ACCEPTED grasps: the number serving would keep
        keep = masks["survive"] & out.refine_accept[0]
        return out, jnp.sum(keep)

    fwd_eval = jax.jit(fwd_eval)

    def rate(fn, sync):
        for i in range(args.warmup):
            jax.block_until_ready(fn(variables, pc, jax.random.PRNGKey(i)))
        t0 = time.perf_counter()
        r = None
        for i in range(args.iters):
            r = fn(variables, pc, jax.random.PRNGKey(100 + i))
        sync(r)
        dt = time.perf_counter() - t0
        return args.iters / dt

    r_fwd = rate(fwd, lambda r: jax.block_until_ready(r))
    r_both = rate(fwd_eval, lambda r: float(r[1]))

    ms_fwd = 1e3 / r_fwd
    ms_both = 1e3 / r_both
    report = {
        "config": f"bf16+slab{args.slab_cell:g}+fpsG{args.fps_groups}, "
                  f"center_num={cfg.region.center_num}",
        "forward_clouds_per_sec": round(r_fwd, 2),
        "forward_plus_eval_clouds_per_sec": round(r_both, 2),
        "eval_delta_ms_per_cloud": round(ms_both - ms_fwd, 3),
        "ref_host_eval_ms_per_cloud": REF_HOST_EVAL_SEC_PER_CLOUD * 1e3,
        "speedup_vs_ref_host_eval": round(
            REF_HOST_EVAL_SEC_PER_CLOUD * 1e3 / max(ms_both - ms_fwd,
                                                    1e-6), 1),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
