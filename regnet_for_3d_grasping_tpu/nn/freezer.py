"""Parameter freezing by path pattern.

Equivalent of the reference ``pn2_utils/nn/freezer.py:15-113`` (regex-based
``requires_grad=False`` / BN-eval freezing).  In JAX, freezing is an
optimizer concern: `freeze_mask` produces a boolean pytree from regex
patterns over parameter paths, and `frozen_optimizer` wraps any optax
transform so masked parameters receive zero updates.  BN freezing
(`freeze_bn` in the reference) corresponds to running those modules with
`use_running_average=True`, which flax exposes per-call via `train=False`.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def freeze_mask(params: Any, patterns: Sequence[str]) -> Any:
    """Pytree of bools: True where the param path matches any regex."""
    regs = [re.compile(p) for p in patterns]
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(r.search(_path_str(path)) for r in regs),
        params)


def frozen_optimizer(inner: optax.GradientTransformation, params: Any,
                     patterns: Sequence[str]) -> optax.GradientTransformation:
    """Wrap `inner` so params matching `patterns` are never updated."""
    mask = freeze_mask(params, patterns)
    return optax.multi_transform(
        {"frozen": optax.set_to_zero(), "trained": inner},
        param_labels=jax.tree.map(
            lambda m: "frozen" if m else "trained", mask))
