"""Parameter freezing by path pattern.

Equivalent of the reference ``pn2_utils/nn/freezer.py:15-113`` (regex-based
``requires_grad=False`` / BN-eval freezing).  In JAX, freezing is an
optimizer concern: `freeze_mask` produces a boolean pytree from regex
patterns over parameter paths, and `frozen_optimizer` wraps any optax
transform so masked parameters receive zero updates.  BN freezing
(`freeze_bn` in the reference) corresponds to running those modules with
`use_running_average=True`, which flax exposes per-call via `train=False`
— globally via the `train` flag, per-module via `apply_with_frozen_bn`.
"""

from __future__ import annotations

import contextlib
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


@contextlib.contextmanager
def frozen_bn(patterns: Sequence[str]):
    """Per-module BN freezing (reference ``nn/freezer.py:96-113`` freeze_bn
    + ``apply_modules`` `module:` patterns).

    Inside this context, any `ConvBN` whose module path matches a pattern
    runs with ``train=False`` regardless of the flag the caller passes:
    its BatchNorm normalizes with the *running* statistics and does not
    update them, while every unmatched module keeps training — torch's
    per-module ``m.eval()``.  Every BatchNorm in this framework lives
    inside `ConvBN` (nn/layers.py), so intercepting `ConvBN.__call__`
    covers them all.

    Usage::

        with frozen_bn([r"score_net/.*"]):
            out, mut = model.apply(vars, x, train=True,
                                   mutable=["batch_stats"], ...)
    """
    from flax import linen as nn

    from regnet_for_3d_grasping_tpu.nn.layers import ConvBN

    regs = [re.compile(p) for p in patterns]

    def interceptor(next_fun, args, kwargs, context):
        if (context.method_name == "__call__"
                and isinstance(context.module, ConvBN)):
            path = "/".join(context.module.path)
            if any(r.search(path) for r in regs):
                if len(args) > 1:        # train passed positionally
                    args = (args[0],) + (False,) + tuple(args[2:])
                else:
                    kwargs = dict(kwargs, train=False)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def apply_with_frozen_bn(model, variables, *args,
                         bn_freeze_patterns: Sequence[str], **kwargs):
    """`model.apply` with per-module BN freezing (see `frozen_bn`)."""
    with frozen_bn(bn_freeze_patterns):
        return model.apply(variables, *args, **kwargs)
