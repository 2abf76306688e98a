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


def make_multislice_mesh(num_slices: int,
                         devices: Optional[Sequence[jax.Device]] = None,
                         dcn_axis: str = "dcn",
                         ici_axis: str = "data") -> Mesh:
    """2-D (DCN x ICI) mesh for multi-slice data parallelism.

    The batch shards over BOTH axes (`multislice_batch_spec`); XLA then
    performs the gradient reduction hierarchically — reduce-scatter over
    ICI within each slice, all-reduce of the partial sums over DCN — which
    is the bandwidth-optimal layout for pure DP (scaling-book recipe).
    With `num_slices=1` this degenerates to `make_mesh`.
    """
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) % num_slices == 0, (num_slices, len(devices))
    arr = np.asarray(devices).reshape(num_slices,
                                      len(devices) // num_slices)
    return Mesh(arr, (dcn_axis, ici_axis))


def multislice_batch_spec(mesh: Mesh) -> P:
    """Batch axis sharded over every mesh axis (DP over DCN x ICI)."""
    return P(tuple(mesh.axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name=None):
    """Device-put a pytree of host arrays with axis-0 sharding over all
    (or the named) mesh axes."""
    spec = P(tuple(mesh.axis_names)) if axis_name is None else P(axis_name)
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
