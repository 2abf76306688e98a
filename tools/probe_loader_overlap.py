"""Measure whether the native input pipeline is on the training critical
path (VERDICT r4 item 5: "measure host-input overlap — the native loader
double-buffers; show it's not on the critical path").

The C++ loader (native/loader.cc) produces whole resampled/jittered/
padded batches on a thread pool while the device executes the previous
step.  Two host-side numbers decide whether that overlap is real:

  * ``producer_ms``  — steady-state cost to PRODUCE one batch, measured
    by draining ``next_batch()`` back-to-back (consumer infinitely
    fast, so every call pays full production cost once the prefetch
    buffer is empty).
  * ``wait_ms(step)`` — the blocking time of ``next_batch()`` when the
    consumer takes ``step`` ms between calls (a ``sleep`` standing in
    for the device step).  With working double-buffering this collapses
    to ~0 whenever ``step >= producer_ms``.

The verdict line compares ``wait_ms`` at the measured r4 training-step
times (398 ms at batch 15, 186 ms at batch 8 — docs/evidence/
train_matrix_r4_part*.log) against the step itself: input is off the
critical path when the residual wait is a few percent of the step.

Host-only (no jax): run it on the training box any time, even while a
chip job is running.

Usage:
  python tools/probe_loader_overlap.py --data-path assets/data_synth_r5 \
      [--batch 15] [--steps 398,186,100,50,25] [--iters 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(loader, iters: int, step_ms: float) -> dict:
    """Blocking time of next_batch() with `step_ms` of consumer work
    (time.sleep) between calls."""
    waits = []
    for _ in range(iters):
        if step_ms:
            time.sleep(step_ms / 1e3)
        t0 = time.perf_counter()
        loader.next_batch()
        waits.append((time.perf_counter() - t0) * 1e3)
    w = np.asarray(waits)
    return {"mean_ms": round(float(w.mean()), 2),
            "p90_ms": round(float(np.percentile(w, 90)), 2),
            "max_ms": round(float(w.max()), 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="assets/data_synth_r5")
    p.add_argument("--batch", type=int, default=15)
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--max-grasps", type=int, default=256)
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--steps", type=str, default="398,186,100,50,25,0",
                   help="consumer step times (ms) to probe; 398/186 = "
                        "the measured r4 batch-15/batch-8 train steps")
    args = p.parse_args()

    from regnet_for_3d_grasping_tpu.data.native_loader import NativeLoader

    cache = os.path.join(args.data_path, "rsc_cache")
    rsc = sorted(glob.glob(os.path.join(cache, "*.rsc")))
    if not rsc:
        raise SystemExit(f"no .rsc cache under {cache} — run training "
                         "once with --native-loader, or convert_dataset")

    loader = NativeLoader(rsc, args.batch, args.num_points,
                          args.max_grasps, seed=0,
                          n_threads=args.threads)
    # warmup: let the pool fill its prefetch buffer, touch every file
    for _ in range(max(4, len(rsc) // args.batch)):
        loader.next_batch()

    report = {"batch": args.batch, "num_points": args.num_points,
              "scenes": len(rsc), "threads": args.threads,
              "probes": {}}

    # steady-state production cost: drain with zero consumer time
    drain = measure(loader, args.iters, 0.0)
    report["producer_ms"] = drain["mean_ms"]
    report["probes"]["drain(step=0)"] = drain

    for step in [float(s) for s in args.steps.split(",") if float(s) > 0]:
        r = measure(loader, args.iters, step)
        r["wait_pct_of_step"] = round(100.0 * r["mean_ms"] / step, 2)
        report["probes"][f"step={step:.0f}ms"] = r

    loader.close()

    crit = report["probes"].get("step=398ms")
    if crit:
        report["verdict"] = (
            f"input OFF the critical path: next_batch blocks "
            f"{crit['mean_ms']:.1f} ms against a 398 ms step "
            f"({crit['wait_pct_of_step']:.1f}%)"
            if crit["mean_ms"] < 0.1 * 398 else
            f"input ON the critical path: {crit['mean_ms']:.1f} ms "
            f"residual wait vs 398 ms step")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
