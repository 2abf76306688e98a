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
    restored = ckptr.restore(path, item=target)
    return restored, epoch + 1
