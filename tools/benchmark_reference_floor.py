"""Measure a composite per-cloud time floor for the reference pipeline.

The reference publishes no throughput numbers (BASELINE.md), so bench.py
compares against a deliberately generous 1.0 clouds/sec estimate.  This
script grounds that estimate by timing behavioral re-statements of the
reference's HOST-SIDE hot loops at the inference preset (25,600 points,
center_num=4000) with torch-CPU tensors — these loops are Python-level
per-item iteration, so a GPU changes their cost very little:

  1. region grouping   — per-center Python loop building each proposal
     region (get_regiondataset.py:330-341 via gripper_region_network.py:
     389-395): distance test + nonzero + choice per center, two scales.
  2. closing-region crop — per-proposal Python loop (gripper_region_
     network.py:532-544): box-mask sum + nonzero + choice per proposal.
  3. collision eval    — per-grasp view + scene checks (evaluation_data_
     generator.py:368-379 -> finger_hand_view:420-483 /
     finger_hand_scene:485-550): a 4xN homogeneous transform, a 3xN
     normal rotation and ~10 mask reductions per grasp.

The composite floor = sum of the loop times for ONE cloud; the true
reference rate also pays the network forward + data loading, so the real
number is lower still.  Output: one JSON line + a human table.

Usage: python tools/benchmark_reference_floor.py [--centers 4000]
       [--grasps 400] [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch


def time_loop(fn, items, budget_s=20.0, min_items=32):
    """Time fn(i) over up to `items` iterations within a wall budget;
    return (seconds_per_item, items_run)."""
    t0 = time.perf_counter()
    n = 0
    for i in range(items):
        fn(i)
        n += 1
        if n >= min_items and time.perf_counter() - t0 > budget_s:
            break
    return (time.perf_counter() - t0) / n, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--centers", type=int, default=4000)
    p.add_argument("--grasps", type=int, default=400,
                   help="surviving grasps reaching the collision eval "
                        "(test-path scale; the validate path evaluates "
                        "every proposal)")
    p.add_argument("--quick", action="store_true",
                   help="5s per-loop budget instead of 20s")
    args = p.parse_args()
    budget = 5.0 if args.quick else 20.0

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    N = 25600
    NC = args.centers
    pc = torch.rand(N, 6)
    pc[:, :3] = pc[:, :3] * 0.5
    centers = pc[rng.choice(N, NC, False), :3]

    # --- 1. region grouping (get_regiondataset.py:330-341): for each
    # center, radius-mask the WHOLE cloud, nonzero, random choice to K;
    # the reference runs this at two scales (K=256 r=0.008 is degenerate
    # in their code path; the wide scale K=2048 r=0.064 dominates).
    xyz = pc[:, :3]

    def group_one(i):
        d2 = torch.sum((xyz - centers[i % NC]) ** 2, dim=-1)
        for K, r in ((256, 0.008), (2048, 0.064)):
            idx = torch.nonzero(d2 < r * r).view(-1)
            if len(idx) > K:
                idx = idx[torch.randperm(len(idx))[:K]]
            elif len(idx) > 0:
                idx = idx[torch.randint(len(idx), (K,))]
            _ = pc[idx]

    s_group, n1 = time_loop(group_one, NC, budget)
    group_cloud = s_group * NC

    # --- 2. closing-region crop (gripper_region_network.py:532-544):
    # the 6-way box mask is vectorized, but selection is a per-proposal
    # Python loop (nonzero + np.random.choice + gather per row).
    region = torch.rand(NC, 2048, 6)
    inside = torch.rand(NC, 2048) < 0.05

    def crop_one(i):
        idx = torch.nonzero(inside[i % NC]).view(-1)
        K = 64
        if len(idx) > K:
            idx = idx[np.random.choice(len(idx), K, replace=False)]
        elif len(idx) > 5:
            idx = idx[np.random.choice(len(idx), K, replace=True)]
        if len(idx) > 5:
            _ = region[i % NC, idx]

    s_crop, n2 = time_loop(crop_one, NC, budget)
    crop_cloud = s_crop * NC

    # --- 3. per-grasp collision eval (evaluation_data_generator.py:
    # 368-379): view pass (finger_hand_view:420-483) then scene pass
    # (finger_hand_scene:485-550) — each grasp transforms the FULL cloud
    # homogeneously, rotates the normals and reduces ~10 masks.
    cloud_homo = torch.cat([xyz.T, torch.ones(1, N)], dim=0)   # [4, N]
    normals = torch.rand(3, N) - 0.5
    Ts = torch.eye(4).expand(64, 4, 4).contiguous()

    def grasp_one(i):
        T = Ts[i % 64]
        local = T @ cloud_homo
        local_n = T[:3, :3] @ normals
        close = (local[0] > -0.06) & (local[0] < 0.06)
        pts = local[:, close][0:3]
        z = (pts[2] < 0.005) & (pts[2] > -0.005)
        back = (pts[1] < 0.05) & (pts[1] > -0.05) & (pts[0] < 0) & z
        if torch.sum(back) > 0:
            return
        yl = (pts[1] < 0.05) & (pts[1] > 0.04)
        yr = (pts[1] > -0.05) & (pts[1] < -0.04)
        if torch.sum(z & (yl | yr)) > 0:
            return
        _ = torch.sum(z & (pts[1] < 0.04) & (pts[1] > -0.04))
        _ = torch.abs(local_n[1]).mean()

    s_view, n3 = time_loop(grasp_one, args.grasps * 2, budget)
    # view + scene pass per surviving grasp (scene clouds are DENSER than
    # the view cloud — same N here keeps the floor conservative)
    eval_cloud = s_view * 2 * args.grasps

    total = group_cloud + crop_cloud + eval_cloud
    floor = 1.0 / total

    print(f"{'loop':44s} {'s/item':>10s} {'items':>7s} {'s/cloud':>9s}")
    print(f"{'region grouping (2 scales x %d centers)' % NC:44s} "
          f"{s_group:10.5f} {n1:7d} {group_cloud:9.2f}")
    print(f"{'closing-region crop (%d proposals)' % NC:44s} "
          f"{s_crop:10.5f} {n2:7d} {crop_cloud:9.2f}")
    print(f"{'collision eval (view+scene, %d grasps)' % args.grasps:44s} "
          f"{s_view:10.5f} {n3:7d} {eval_cloud:9.2f}")
    print(f"{'COMPOSITE host-side floor':44s} {'':10s} {'':7s} "
          f"{total:9.2f}")
    print(json.dumps({
        "group_s_per_cloud": round(group_cloud, 3),
        "crop_s_per_cloud": round(crop_cloud, 3),
        "eval_s_per_cloud": round(eval_cloud, 3),
        "composite_s_per_cloud": round(total, 3),
        "reference_clouds_per_sec_upper_bound": round(floor, 5),
        "centers": NC, "grasps": args.grasps,
    }))


if __name__ == "__main__":
    main()
