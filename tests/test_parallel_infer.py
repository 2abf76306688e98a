"""Data-parallel inference on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
from regnet_for_3d_grasping_tpu.models import REGNet
from regnet_for_3d_grasping_tpu.parallel.infer import make_dp_inference
from regnet_for_3d_grasping_tpu.parallel.mesh import make_mesh
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_inference_matches_single_device():
    cfg = tiny_config()
    model = REGNet(cfg)
    N = cfg.region.num_points

    clouds = []
    for i in range(8):
        s = make_synthetic_scene(100 + i, num_view=N)
        clouds.append(np.c_[s["view_cloud"], s["view_cloud_color"]])
    pc = jnp.asarray(np.stack(clouds).astype(np.float32))

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": jax.random.PRNGKey(1),
                            "sampling": jax.random.PRNGKey(2)}, pc[:1])

    mesh = make_mesh()
    out = make_dp_inference(model, mesh)(variables, pc, key)
    assert out.proposals.sharding.num_devices == 8

    # Contract (parallel/infer.py docstring): shard i bit-reproduces the
    # SOLO run of cloud i under the folded key.  (Bit-equality with a
    # monolithic batched run does not hold: the hash_uniform selection
    # noise is an iota over the local batch shape, so batch position
    # changes the tie-break stream — per-cloud equivalence is the real
    # invariant.)
    solo = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))
    for i in [0, 3, 7]:
        ref = solo(variables, pc[i:i + 1], jax.random.fold_in(key, i))
        np.testing.assert_array_equal(
            np.asarray(out.center_index[i]), np.asarray(ref.center_index[0]))
        np.testing.assert_allclose(
            np.asarray(out.final_grasps[i]), np.asarray(ref.final_grasps[0]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(out.refine_accept[i]),
            np.asarray(ref.refine_accept[0]))

    # and the shards are NOT identical clones (keys decorrelated)
    assert not np.array_equal(np.asarray(out.center_index[0]),
                              np.asarray(out.center_index[1]))
