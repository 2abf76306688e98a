"""Import reference torch checkpoints into this framework's param tree.

The reference distributes whole-module ``torch.save`` checkpoints
(``score_{N}.model`` / ``region_{N}.model``, utils.py:59-115).  None are
committed to its repo, but if they surface, this converter maps their
state_dicts onto our flax trees — module-for-module per docs/PARITY.md —
unlocking value-level golden parity on test_file.

Shape conventions handled:
  torch Conv1d/Conv2d 1x1 weight [Cout, Cin, 1(,1)] -> Dense kernel
  [Cin, Cout]; BatchNorm weight/bias -> scale/bias, running stats ->
  batch_stats.

The unused reference heads (ScoreNetwork's k_obj classifier,
PointNet2TwoStage.linear_cls) have no counterpart here and are skipped.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# our ConvBN block name -> reference (conv, bn) prefixes, per model
_SCORE_MAP = {}
for i in range(3):          # SA modules (pointnet2.py:53-62)
    for j in range(3):
        _SCORE_MAP[f"backbone/sa{i}/mlp/layer{j}"] = \
            f"extrat_featurePN2.sa_modules.{i}.mlp.{j}"
for i in range(3):          # FP modules (pointnet2.py:67-74)
    n = (2, 2, 3)[i]
    for j in range(n):
        _SCORE_MAP[f"backbone/fp{i}/mlp/layer{j}"] = \
            f"extrat_featurePN2.fp_modules.{i}.mlp.{j}"
for j in range(4):          # seg head SharedMLP (pointnet2.py:78)
    _SCORE_MAP[f"backbone/seg_mlp/layer{j}"] = \
        f"extrat_featurePN2.mlp.{j}"

_REGION_MAP = {             # PointNet2TwoStage (pointnet2.py:123-197)
    "grn_head/stem": ("extrat_feature_region.conv",
                      "extrat_feature_region.bn"),
    "grn_head/cls1": ("extrat_feature_region.conv_cls2",
                      "extrat_feature_region.bn_cls2"),
    "grn_head/cls2": ("extrat_feature_region.conv_cls3",
                      "extrat_feature_region.bn_cls3"),
    "grn_head/cls3": ("extrat_feature_region.conv_cls4",
                      "extrat_feature_region.bn_cls4"),
    "grn_head/reg1": ("extrat_feature_region.conv_reg2",
                      "extrat_feature_region.bn_reg2"),
    "grn_head/reg2": ("extrat_feature_region.conv_reg3",
                      "extrat_feature_region.bn_reg3"),
    "grn_head/reg3": ("extrat_feature_region.conv_reg4",
                      "extrat_feature_region.bn_reg4"),
    # PointNet2Refine (pointnet2.py:199-254)
    "refine_head/stem": ("extrat_feature_refine.conv_formal",
                         "extrat_feature_refine.bn_formal"),
    "refine_head/cls1": ("extrat_feature_refine.conv_formal_cls2",
                         "extrat_feature_refine.bn_formal_cls2"),
    "refine_head/cls2": ("extrat_feature_refine.conv_formal_cls3",
                         "extrat_feature_refine.bn_formal_cls3"),
    "refine_head/reg1": ("extrat_feature_refine.conv_formal_reg2",
                         "extrat_feature_refine.bn_formal_reg2"),
    "refine_head/reg2": ("extrat_feature_refine.conv_formal_reg3",
                         "extrat_feature_refine.bn_formal_reg3"),
}


def _block_map(prefix: str) -> Dict[str, Tuple[str, str]]:
    """Full {our block path: (torch conv prefix, torch bn prefix)}."""
    out = {}
    for ours, ref in _SCORE_MAP.items():
        out[f"{prefix}score_net/{ours}"] = (f"{ref}.conv", f"{ref}.bn")
    # final score conv + bn (pointnet2.py:82-83)
    out[f"{prefix}score_net/backbone/score_dense"] = (
        "extrat_featurePN2.conv_score", None)
    out[f"{prefix}score_net/backbone/score_bn"] = (
        None, "extrat_featurePN2.bn_score")
    for ours, (conv, bn) in _REGION_MAP.items():
        out[f"{prefix}{ours}"] = (conv, bn)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv weight [Cout, Cin, 1(,1)] -> Dense [Cin, Cout]."""
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return np.ascontiguousarray(w.T)


def convert_torch_state_dicts(score_sd: dict | None, region_sd: dict | None,
                              params: dict, batch_stats: dict
                              ) -> Tuple[dict, dict, list]:
    """Overlay reference state_dict values onto (copies of) our trees.

    Args:
      score_sd / region_sd: torch ``state_dict()``-style {name: array}
        (values may be torch tensors or numpy arrays; ``module.`` prefixes
        are stripped like utils.py:64-68).
      params / batch_stats: our initialized trees (templates).

    Returns:
      (new_params, new_batch_stats, report) — report lists every mapped
      entry; raises on any shape mismatch.
    """
    import jax

    merged: Dict[str, np.ndarray] = {}
    for sd in (score_sd, region_sd):
        if sd:
            for k, v in sd.items():
                merged[k.replace("module.", "")] = np.asarray(
                    getattr(v, "detach", lambda: v)()
                    if hasattr(v, "detach") else v)

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    report = []

    def set_path(tree, path, value):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        old = node[parts[-1]]
        if old.shape != value.shape:
            raise ValueError(f"{path}: shape {old.shape} != {value.shape}")
        node[parts[-1]] = value.astype(old.dtype)
        report.append(path)

    for ours, (conv, bn) in _block_map("").items():
        if conv is not None and f"{conv}.weight" in merged:
            kern = _conv_kernel(merged[f"{conv}.weight"])
            # our ConvBN nests a Dense named "dense"; the two bare layers
            # (score_dense / score_bn) are unnested.  Conv biases are never
            # imported: every reference conv that has one is immediately
            # followed by a BatchNorm, which absorbs it.
            dense_path = f"{ours}/dense/kernel" if bn is not None \
                else f"{ours}/kernel"
            set_path(params, dense_path, kern)
        if bn is not None and f"{bn}.weight" in merged:
            bn_path = ours if conv is None else f"{ours}/bn"
            set_path(params, f"{bn_path}/scale", merged[f"{bn}.weight"])
            set_path(params, f"{bn_path}/bias", merged[f"{bn}.bias"])
            set_path(batch_stats, f"{bn_path}/mean",
                     merged[f"{bn}.running_mean"])
            set_path(batch_stats, f"{bn_path}/var",
                     merged[f"{bn}.running_var"])
    return params, batch_stats, report
