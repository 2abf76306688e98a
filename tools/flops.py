"""Analytic FLOP/byte accounting for the cascade (roofline evidence).

Counts the MXU work (dense/conv MACs) and the dominant VPU/HBM work
(distance fields, selections) per pipeline stage from the config, so
README's MFU claim is reproducible:

  python tools/flops.py [--centers 4000] [--clouds-per-sec 19.2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from regnet_for_3d_grasping_tpu.utils.config import infer_config  # noqa: E402


def backbone_macs(cfg) -> dict:
    m = cfg.model
    out = {}
    # SA stages: per (centroid, neighbour) an MLP over cin+3 channels
    cin = m.input_channels - 3
    for i, (s, k, chans) in enumerate(zip(m.num_centroids,
                                          m.num_neighbours,
                                          m.sa_channels)):
        c = cin + 3
        macs = 0
        for ch in chans:
            macs += c * ch
            c = ch
        out[f"sa{i}"] = s * k * macs
        cin = chans[-1]
    # FP stages
    sa_out = [m.input_channels - 3] + [c[-1] for c in m.sa_channels]
    dense_ns = [cfg.region.num_points] + list(m.num_centroids)
    sparse_c = sa_out[-1]
    for i, chans in enumerate(m.fp_channels):
        dense_n = dense_ns[-2 - i]
        c = sparse_c + sa_out[-2 - i]
        macs = 0
        for ch in chans:
            macs += c * ch
            c = ch
        out[f"fp{i}"] = dense_n * macs
        sparse_c = chans[-1]
    # seg head
    c = sparse_c
    macs = 0
    for ch in m.seg_channels:
        macs += c * ch
        c = ch
    macs += c * 1
    out["seg_head"] = cfg.region.num_points * macs
    return out


def head_macs(cfg) -> dict:
    m, r = cfg.model, cfg.region
    A, R, C = m.num_anchors, m.reg_channels, m.feature_channels
    grn = C * 1024 + 1024 * 256 + 256 * 128 + 128 * A \
        + 1024 * 256 + 256 * 128 + 128 * A * R
    refine_in = C + m.refine_group_channels
    ref = refine_in * 1024 + 1024 * 128 + 128 * 2 \
        + 1024 * 128 + 128 * R
    return {"grn_head": r.center_num * grn,
            "refine_head": r.center_num * ref}


def geometry_work(cfg) -> dict:
    """Dominant non-MXU work: [M, N]-shaped mask/selection fields
    (elements, not FLOPs — VPU passes scale with these)."""
    r = cfg.region
    n, m = r.num_points, cfg.model.num_centroids
    return {
        "fps_backbone": m[0] * n + m[1] * m[0] + m[2] * m[1],
        "fps_centers": r.center_num * n,
        "ball_query": m[0] * n + m[1] * m[0] + m[2] * m[1],
        "grouping": r.center_num * n,
        "crop": r.center_num * n,
        "three_nn": n * m[0] + m[0] * m[1] + m[1] * m[2],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--centers", type=int, default=4000)
    p.add_argument("--clouds-per-sec", type=float, default=0.0)
    args = p.parse_args()
    cfg = infer_config(**{"region.center_num": args.centers})

    bb = backbone_macs(cfg)
    hd = head_macs(cfg)
    total_macs = sum(bb.values()) + sum(hd.values())
    print(f"MXU work per cloud (center_num={args.centers}):")
    for k, v in {**bb, **hd}.items():
        print(f"  {k:12s} {2 * v / 1e9:8.2f} GFLOP")
    print(f"  {'TOTAL':12s} {2 * total_macs / 1e9:8.2f} GFLOP")

    geo = geometry_work(cfg)
    print("\nVPU/HBM-bound mask fields per cloud (elements):")
    for k, v in geo.items():
        print(f"  {k:12s} {v / 1e6:8.1f} M")

    if args.clouds_per_sec:
        tf = 2 * total_macs * args.clouds_per_sec / 1e12
        print(f"\nAt {args.clouds_per_sec} clouds/sec: "
              f"{tf:.2f} TFLOP/s of MXU work "
              f"(~{100 * tf / 197:.1f}% of v5e bf16 peak, "
              f"~{100 * tf / 49:.1f}% of f32)")


if __name__ == "__main__":
    main()
