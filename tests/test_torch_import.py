"""Torch-checkpoint converter: synthetic state_dicts land in the right
slots with the right transposes (no reference weights are published, so
the test fabricates torch-shaped tensors and checks placement)."""

import jax
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.models import REGNet
from regnet_for_3d_grasping_tpu.utils.config import train_config
from regnet_for_3d_grasping_tpu.utils.torch_import import (
    _block_map,
    convert_torch_state_dicts,
)


@pytest.fixture(scope="module")
def trees():
    # full-size architecture (the mapping is defined for the reference
    # channel configuration) — init via eval_shape to avoid real compute
    cfg = train_config()
    model = REGNet(cfg)
    import jax.numpy as jnp
    pc = jnp.zeros((1, 256, 6))   # point count is irrelevant to shapes
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "sampling": jax.random.PRNGKey(1)}, pc))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    return zeros["params"], zeros["batch_stats"]


def _fake_state_dicts(params, batch_stats, rng):
    """Build torch-shaped state_dicts covering every mapped block."""
    score_sd, region_sd = {}, {}

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return node

    for ours, (conv, bn) in _block_map("").items():
        sd = score_sd if ours.startswith("score_net") else region_sd
        if conv is not None:
            dense = f"{ours}/dense/kernel" if bn is not None \
                else f"{ours}/kernel"
            cin, cout = get(params, dense).shape
            sd[f"{conv}.weight"] = rng.randn(cout, cin, 1).astype(
                np.float32)
            sd[f"{conv}.bias"] = rng.randn(cout).astype(np.float32)
        if bn is not None:
            bn_path = ours if conv is None else f"{ours}/bn"
            c = get(params, f"{bn_path}/scale").shape[0]
            # add a DataParallel-style prefix to exercise stripping
            sd[f"module.{bn}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{bn}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{bn}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{bn}.running_var"] = rng.rand(c).astype(np.float32)
    return score_sd, region_sd


def test_conversion_places_every_block(trees, rng):
    params, batch_stats = trees
    score_sd, region_sd = _fake_state_dicts(params, batch_stats, rng)
    new_p, new_bs, report = convert_torch_state_dicts(
        score_sd, region_sd, params, batch_stats)
    # every mapped block contributed params + bn stats
    blocks = _block_map("")
    assert len(report) >= len(blocks)

    # spot-check the transpose: sa0 layer0 conv [128, 6, 1] -> [6, 128]
    w = score_sd["extrat_featurePN2.sa_modules.0.mlp.0.conv.weight"]
    got = new_p["score_net"]["backbone"]["sa0"]["mlp"]["layer0"][
        "dense"]["kernel"]
    np.testing.assert_array_equal(got, w[:, :, 0].T)

    # bn stats landed (module. prefix stripped)
    bs = new_bs["score_net"]["backbone"]["sa0"]["mlp"]["layer0"]["bn"]
    np.testing.assert_array_equal(
        bs["mean"],
        score_sd["extrat_featurePN2.sa_modules.0.mlp.0.bn.running_mean"])
    sc = new_p["score_net"]["backbone"]["sa0"]["mlp"]["layer0"]["bn"][
        "scale"]
    np.testing.assert_array_equal(
        sc, score_sd["module.extrat_featurePN2.sa_modules.0.mlp.0."
                     "bn.weight"])

    # refine head final reg conv mapped too
    w2 = region_sd["extrat_feature_refine.conv_formal_reg3.weight"]
    got2 = new_p["refine_head"]["reg2"]["dense"]["kernel"]
    np.testing.assert_array_equal(got2, w2[:, :, 0].T)


def test_shape_mismatch_raises(trees, rng):
    params, batch_stats = trees
    bad = {"extrat_featurePN2.sa_modules.0.mlp.0.conv.weight":
           rng.randn(7, 7, 1).astype(np.float32)}
    with pytest.raises(ValueError, match="shape"):
        convert_torch_state_dicts(bad, None, params, batch_stats)
