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

    ref = jax.jit(lambda v, x, k: model.apply(
        v, x, train=False, rngs={"sampling": k}))(variables, pc, key)

    mesh = make_mesh()
    out = make_dp_inference(model, mesh)(variables, pc, key)

    # the program is per-cloud geometry — partitioning the batch axis must
    # not change any result
    assert out.proposals.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(out.center_index),
                                  np.asarray(ref.center_index))
    np.testing.assert_allclose(np.asarray(out.final_grasps),
                               np.asarray(ref.final_grasps),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.refine_accept),
                                  np.asarray(ref.refine_accept))
