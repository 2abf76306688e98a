"""Orbax checkpointing with the reference's resume semantics.

Reference: whole-module ``torch.save`` per epoch with the epoch parsed back
out of the filename (utils.py:59-115, SURVEY §5.4).  Here each checkpoint is
a directory ``ckpt_{epoch}`` holding params + batch_stats + optimizer state
(which the reference loses on resume) and the epoch number.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(base_dir: str, epoch: int, state: Any) -> str:
    path = os.path.join(os.path.abspath(base_dir), f"ckpt_{epoch}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
    return path


def latest_epoch(base_dir: str) -> Optional[int]:
    if not os.path.isdir(base_dir):
        return None
    epochs = [int(m.group(1)) for n in os.listdir(base_dir)
              if (m := re.fullmatch(r"ckpt_(\d+)", n))]
    return max(epochs) if epochs else None


def restore_checkpoint(base_dir: str, epoch: Optional[int] = None,
                       target: Any = None) -> tuple[Any, int]:
    """Returns (state, resume_epoch = saved epoch + 1), like the
    reference's `resume_num = 1 + parsed_epoch` (utils.py:69).

    Pass `target` (a template state, e.g. a freshly-initialized TrainState
    dict) to preserve container types — without it orbax restores plain
    dicts and the optax NamedTuple optimizer state is lost, making the
    restored state unusable for further train steps.
    """
    if epoch is None:
        epoch = latest_epoch(base_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    path = os.path.join(os.path.abspath(base_dir), f"ckpt_{epoch}")
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        # Restore to host numpy arrays: checkpoints written from a TPU
        # process embed device shardings that fail to deserialize in a
        # CPU-forced process (orbax raises "sharding ... Got None");
        # inference/eval tools only need values, not placement.
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        restored = ckptr.restore(path, restore_args=restore_args)
    else:
        restored = ckptr.restore(path, item=target)
    return restored, epoch + 1


# --- git-trackable weight artifacts -------------------------------------
#
# Orbax checkpoint trees live under the gitignored assets/ directory, which
# does not survive across build rounds; the canonical frozen-suite metrics
# (tools/benchmark_eval.py) must stay reproducible from a COMMITTED
# artifact.  These helpers flatten {params, batch_stats} to a single
# compressed .npz with '/'-joined key paths — exact f32 values, so metrics
# reproduce bit-for-bit.  The reference analogously ships its trained
# `.model` files in-repo (test_file/, README "pretrained models").

def _flatten(tree: Any, prefix: str, out: dict) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    else:
        out[prefix] = np.asarray(tree)


def export_weights_npz(path: str, restored: Any, epoch: int) -> None:
    """Write params + batch_stats (NOT optimizer state) from a restored
    checkpoint dict to one compressed npz, with the epoch recorded."""
    flat: dict = {}
    _flatten(restored["params"], "params", flat)
    _flatten(restored.get("batch_stats", {}), "batch_stats", flat)
    flat["__epoch__"] = np.asarray(epoch, np.int32)
    np.savez_compressed(path, **flat)


def load_weights_npz(path: str) -> tuple[dict, int]:
    """Returns ({"params": ..., "batch_stats": ...}, epoch) with nested
    dicts rebuilt from the '/'-joined npz keys — directly usable as flax
    apply() variables."""
    data = np.load(path)
    variables: dict = {"params": {}, "batch_stats": {}}
    epoch = int(data["__epoch__"])
    for key in data.files:
        if key == "__epoch__":
            continue
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return variables, epoch
