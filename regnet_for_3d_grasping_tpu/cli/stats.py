"""Dataset statistics — the reference's ``count.py:1-36``.

Reports the mean number of GT grasps per scene and the mean antipodal
score over a dataset directory.

Usage: python -m regnet_for_3d_grasping_tpu.cli.stats --data-path /data
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from regnet_for_3d_grasping_tpu.data.dataset import load_scene


def main(argv=None):
    p = argparse.ArgumentParser(description="dataset grasp statistics")
    p.add_argument("--data-path", type=str, required=True)
    args = p.parse_args(argv)

    paths = sorted(glob.glob(os.path.join(args.data_path, "**", "*.p"),
                             recursive=True))
    counts, scores = [], []
    for path in paths:
        try:
            data = load_scene(path)
        except Exception:
            continue
        if "select_frame" in data:
            counts.append(len(data["select_frame"]))
            scores.append(np.mean(data["select_antipodal_score"]))
        elif "frame" in data:
            counts.append(len(data["frame"]))
            scores.append(np.mean(data["antipodal_score"]))
    if not counts:
        raise SystemExit(f"no labelled scenes under {args.data_path}")
    print(f"scenes: {len(counts)}")
    print(f"mean grasps/scene: {np.mean(counts):.2f}")
    print(f"mean antipodal score: {np.mean(scores):.4f}")


if __name__ == "__main__":
    main()
