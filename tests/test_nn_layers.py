"""ConvBN/SharedMLP semantics pins: BN momentum matches the torch
convention (0.1 — nn/modules/conv.py:18), stats reduce over all leading
axes, eval mode uses running stats."""

import jax
import jax.numpy as jnp
import numpy as np

from regnet_for_3d_grasping_tpu.nn import ConvBN, SharedMLP


def test_bn_momentum_torch_convention(rng):
    m = ConvBN(4, relu=False)
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # force identity dense so BN sees x directly
    params = jax.tree.map(np.array, v["params"])
    params["dense"]["kernel"] = np.eye(4, dtype=np.float32)
    _, mut = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                     x, train=True, mutable=["batch_stats"])
    new_mean = np.asarray(mut["batch_stats"]["bn"]["mean"])
    batch_mean = np.asarray(x).mean(0)
    # torch: running = (1 - 0.1) * running + 0.1 * batch; running init 0
    np.testing.assert_allclose(new_mean, 0.1 * batch_mean, rtol=1e-5)


def test_bn_reduces_over_all_leading_axes(rng):
    m = ConvBN(3, relu=False)
    x = jnp.asarray(rng.randn(2, 5, 7, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(np.array, v["params"])
    params["dense"]["kernel"] = np.eye(3, dtype=np.float32)
    _, mut = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                     x, train=True, mutable=["batch_stats"])
    new_mean = np.asarray(mut["batch_stats"]["bn"]["mean"])
    np.testing.assert_allclose(new_mean,
                               0.1 * np.asarray(x).reshape(-1, 3).mean(0),
                               rtol=1e-5)


def test_eval_uses_running_stats(rng):
    m = ConvBN(4, relu=False)
    x = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # eval output with init stats (mean 0, var 1) == dense output exactly
    y = m.apply(v, x, train=False)
    dense = x @ np.asarray(v["params"]["dense"]["kernel"])
    scale = np.asarray(v["params"]["bn"]["scale"])
    np.testing.assert_allclose(np.asarray(y),
                               dense * scale / np.sqrt(1 + 1e-5),
                               rtol=1e-4, atol=1e-5)


def test_shared_mlp_dropout_only_in_train(rng):
    m = SharedMLP((8, 8), dropout_prob=0.5)
    x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    a = m.apply(v, x, train=False)
    b = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = m.apply(v, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)},
                   mutable=["batch_stats"])
    assert not np.allclose(np.asarray(a), np.asarray(c))
