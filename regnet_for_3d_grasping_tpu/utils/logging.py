"""Scalar metric logging with reference-compatible tag names.

The reference logs every loss term to tensorboardX at batch and epoch
granularity (utils.py:137-235).  tensorboard isn't in this image, so the
primary sink is JSONL (one record per scalar, trivially plottable); if a
tensorboard writer is importable it is used as a secondary sink with the
same ``batch_{mode}_{tag}`` / ``epoch_{mode}_{tag}`` names so curves remain
comparable with torch runs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping


class MetricLogger:
    def __init__(self, log_dir: str, tag: str = "default"):
        self.dir = os.path.join(log_dir, tag)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a",
                       buffering=1)
        self._tb = None
        try:  # optional secondary sink
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def scalar(self, name: str, value, step: int):
        rec = {"tag": name, "value": float(value), "step": int(step),
               "time": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(name, float(value), step)

    def scalars(self, metrics: Mapping[str, object], step: int,
                mode: str = "train", granularity: str = "batch"):
        for k, v in metrics.items():
            self.scalar(f"{granularity}_{mode}_{k}", v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
