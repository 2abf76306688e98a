"""Data-parallel inference over a device mesh.

The reference serves inference strictly one cloud / one GPU
(test.py:61-148).  On TPU the cascade is latency-bound per cloud on a
single core (batched inference on ONE chip measured no gain —
docs/ROADMAP.md), so the way to scale serving throughput is one cloud
per chip: shard the batch axis of the already-batched forward over a
1-D ``data`` mesh, replicate the parameters, and let GSPMD partition
the whole program — every stage of the cascade is per-cloud geometry,
so no cross-chip collective is emitted at all and throughput scales
linearly over ICI.
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from regnet_for_3d_grasping_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)


def make_dp_inference(model, mesh, axis_name: str = "data",
                      with_refine: bool = True):
    """Jitted ``(variables, pc[B,N,6], key) -> REGNetOutput`` with the
    batch sharded over ``mesh`` and parameters replicated.

    ``shard_map`` (same pattern as train/trainer.py) rather than bare
    GSPMD sharding constraints: each device traces the full per-shard
    cascade locally, so the gated Pallas kernels (ops/*_pallas.py) see
    ordinary local shapes instead of relying on the SPMD partitioner to
    split a Mosaic custom call.

    ``B`` must be a multiple of the mesh size; pad the final partial
    batch with any cloud and drop the extra outputs (they're per-cloud
    independent, so padding never perturbs real results).

    The sampling key is decorrelated per shard by folding in the device's
    ``axis_index`` (same as train/trainer.py:108-115) — a replicated key
    would reuse the batch-position-0 noise stream on every device, since
    the selection noise (ops/sampling.hash_uniform) is a linear iota over
    the *local* batch shape.  Shard ``i`` therefore reproduces exactly the
    single-cloud run ``model.apply(..., pc[i:i+1],
    rngs={"sampling": fold_in(key, i)})`` — per-cloud equivalence, not
    bit-equality with a monolithic batched run (whose noise stream couples
    batch positions).
    """
    bsh = batch_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def body(variables, pc, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        return model.apply(variables, pc, train=False,
                           with_refine=with_refine,
                           rngs={"sampling": key})

    fwd = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=P(axis_name)))

    def run(variables, pc, key):
        variables = jax.device_put(variables, rep)
        pc = jax.device_put(pc, bsh)
        return fwd(variables, pc, key)

    return run
