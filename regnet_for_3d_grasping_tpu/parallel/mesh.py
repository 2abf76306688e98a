"""Device-mesh data parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(utils.py:123-135) — replicate the module, scatter the batch, gather the
outputs, every step, over PCIe.  The TPU-native replacement (SURVEY §2.7):
one ``jax.sharding.Mesh`` with a ``data`` axis over ICI; the batch is
sharded on axis 0, parameters are replicated, and the gradient all-reduce
is an XLA ``psum`` riding ICI inside the jitted step (train/trainer.py).

A second (currently size-1) ``model`` axis is laid out for future
multi-slice scaling over DCN — batch-DP is the only parallelism the model
family needs (the networks are a few M params; SURVEY §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with axis-0 sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
