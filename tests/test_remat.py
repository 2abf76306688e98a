"""Backbone rematerialization: identical gradients, same param tree."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from regnet_for_3d_grasping_tpu.models import ScoreNet
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


def test_remat_grads_match_plain(rng):
    cfg = tiny_config()
    pc = jnp.asarray(
        rng.rand(2, cfg.region.num_points, 6).astype(np.float32))
    plain = ScoreNet(cfg.model)
    remat = ScoreNet(dataclasses.replace(cfg.model, remat_backbone=True))
    v = plain.init(jax.random.PRNGKey(0), pc)
    v2 = remat.init(jax.random.PRNGKey(0), pc)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(
        v2["params"])

    def grads(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                pc, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            feat, score = out
            return jnp.mean(score ** 2) + jnp.mean(feat ** 2)
        return jax.grad(f)(v["params"])

    g1, g2 = grads(plain), grads(remat)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
