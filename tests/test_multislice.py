"""Multi-slice (DCN x ICI) data parallelism on the virtual CPU mesh."""

import tempfile

import jax
import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import (
    GraspDataset,
    write_synthetic_dataset,
)
from regnet_for_3d_grasping_tpu.models import REGNet
from regnet_for_3d_grasping_tpu.parallel import shard_batch
from regnet_for_3d_grasping_tpu.parallel.mesh import make_multislice_mesh
from regnet_for_3d_grasping_tpu.train import trainer
from regnet_for_3d_grasping_tpu.utils.config import tiny_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_2x4_multislice_train_step():
    cfg = tiny_config()
    d = tempfile.mkdtemp(prefix="ms_")
    write_synthetic_dataset(d, num_scenes=10,
                            num_view=cfg.region.num_points)
    ds = GraspDataset(d, "train", cfg.region.num_points,
                      cfg.region.max_gt_grasps)
    mesh = make_multislice_mesh(2)          # 2 slices x 4 chips
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)

    model = REGNet(cfg)
    batch = next(ds.batches(8, seed=0, drop_last=False))
    dbatch = trainer.device_batch(batch)
    optimizer = trainer.make_optimizer(cfg, steps_per_epoch=2)
    state = trainer.init_state(model, cfg, optimizer, dbatch.pc)

    step = trainer.make_train_step(model, optimizer, cfg, stage="refine",
                                   mesh=mesh)
    new_state, metrics = step(state, shard_batch(dbatch, mesh),
                              jax.random.PRNGKey(0))
    jax.block_until_ready(new_state)
    assert np.isfinite(float(metrics["loss_total"]))
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
