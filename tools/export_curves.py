"""Export per-epoch training/validation curves from a run's metrics.jsonl.

Usage: python tools/export_curves.py assets/log/<tag>/metrics.jsonl [out.tsv]

Produces the TSV consumed by docs/evidence/TRAINING.md (one row per epoch;
empty cells where a stage produced no grasps that epoch).
"""

from __future__ import annotations

import json
import sys

COLS = [
    ("train_loss", "epoch_train_loss"),
    ("stage2_vgr", "epoch_validate_stage2_vgr"),
    ("stage2_score", "epoch_validate_stage2_score"),
    ("stage3_vgr", "epoch_validate_stage3_class_vgr"),
    ("stage3_score", "epoch_validate_stage3_class_score"),
    ("stage3thr_vgr", "epoch_validate_stage3_score_vgr"),
    ("stage3thr_score", "epoch_validate_stage3_score_score"),
]


def main():
    path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/dev/stdout"
    by_epoch: dict[int, dict[str, float]] = {}
    for line in open(path):
        d = json.loads(line)
        for col, tag in COLS:
            if d["tag"] == tag:
                by_epoch.setdefault(int(d["step"]), {})[col] = d["value"]

    with open(out_path, "w") as f:
        f.write("epoch\t" + "\t".join(c for c, _ in COLS) + "\n")
        for e in sorted(by_epoch):
            row = by_epoch[e]
            cells = [f"{row[c]:.4f}" if c in row else ""
                     for c, _ in COLS]
            f.write(f"{e}\t" + "\t".join(cells) + "\n")


if __name__ == "__main__":
    main()
