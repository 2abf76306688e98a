"""On-chip A/B: flat sum-of-spans grid vs full grid (ops/slab.py).

The round-3 slab kernels walked a (B, T, cap) grid — ~1us per grid step
even when the step's scan block is outside the tile's span.  The flat
grid (one step per live (tile, block) pair, scalar-prefetched mapping)
removes the dead steps.  This script, at the inference preset's shapes
on a real synthetic scene:

  * compile-checks every flat kernel on the chip (Mosaic lowering),
  * asserts bit-identity against the full grid,
  * times flat vs full for: region grouping, closing-region crop,
    SA1 ball query, FP3 three-NN.

Usage: python tools/ab_flat_grid.py [--cell 0.04] [--centers 4000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(name, fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda *a: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(fn(*a))))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms")
    return dt


def check(name, a, b):
    import numpy as np
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print(f"{name:52s} bit-identical ({len(a)} outputs)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", type=float, default=0.04)
    p.add_argument("--centers", type=int, default=4000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu import ops
    from regnet_for_3d_grasping_tpu.data import make_synthetic_scene
    from regnet_for_3d_grasping_tpu.ops import slab as S
    from regnet_for_3d_grasping_tpu.utils.config import infer_config

    cfg = infer_config(**{"region.center_num": args.centers})
    cell = args.cell
    scene = make_synthetic_scene(0, num_view=cfg.region.num_points)
    pc = jnp.asarray(np.c_[scene["view_cloud"],
                           scene["view_cloud_color"]][None].astype(
                               np.float32))
    print(f"device={jax.devices()[0]}  centers={args.centers}  "
          f"cell={cell}")
    _, sc = S.sort_cloud(jax.random.PRNGKey(0), pc, cell)

    # x-sorted centers, as models/regnet.py produces in slab mode
    rng = np.random.RandomState(3)
    xyz = np.asarray(sc.xyz[0])
    c = xyz[rng.choice(xyz.shape[0], args.centers, False)]
    centers = jnp.asarray(c[np.argsort(c[:, 0])][None])

    seed = jnp.uint32(7)
    radius = cfg.group_radius
    K = cfg.region.group_num

    flat = S.group_slab(sc, centers, seed, radius, K, cell, grid_span=4)
    full = S.group_slab(sc, centers, seed, radius, K, cell, grid_span=99)
    check("region group_slab", flat, full)
    bench("region group_slab FLAT",
          lambda s_, c_: S.group_slab(s_, c_, seed, radius, K, cell,
                                      grid_span=4),
          sc, centers)
    bench("region group_slab FULL",
          lambda s_, c_: S.group_slab(s_, c_, seed, radius, K, cell,
                                      grid_span=99), sc, centers)

    frames = jnp.tile(jnp.eye(3)[None, None], (1, args.centers, 1, 1))
    box = (0.0, cfg.gripper.depth / 2, cfg.gripper.width / 2,
           cfg.gripper.height / 2)
    KG = cfg.region.gripper_num
    flat = S.crop_slab(sc, frames, centers, seed, box, KG, cell,
                       grid_span=5)
    full = S.crop_slab(sc, frames, centers, seed, box, KG, cell,
                       grid_span=99)
    check("closing-region crop_slab", flat, full)
    bench("crop_slab FLAT",
          lambda s_, f_, c_: S.crop_slab(s_, f_, c_, seed, box, KG, cell,
                                         grid_span=5),
          sc, frames, centers)
    bench("crop_slab FULL",
          lambda s_, f_, c_: S.crop_slab(s_, f_, c_, seed, box, KG, cell,
                                         grid_span=99),
          sc, frames, centers)

    sa1 = cfg.model
    cj = ops.gather_points(sc.xyz, ops.farthest_point_sample(
        sc.xyz, sa1.num_centroids[0]))
    cj = jnp.take_along_axis(
        cj, jnp.argsort(cj[..., 0], axis=-1)[..., None], axis=1)
    flat = S.group_slab(sc, cj, seed, sa1.radii[0],
                        sa1.num_neighbours[0], cell, win=256, spw=2,
                        distinct=True, grid_span=4)
    full = S.group_slab(sc, cj, seed, sa1.radii[0],
                        sa1.num_neighbours[0], cell, win=256, spw=2,
                        distinct=True, grid_span=99)
    check("SA1 ball_query_slab", flat[:1], full[:1])
    bench("SA1 ball_query_slab FLAT",
          lambda s_, c_: S.group_slab(
              s_, c_, seed, sa1.radii[0], sa1.num_neighbours[0], cell,
              win=256, spw=2, distinct=True, grid_span=4),
          sc, cj)
    bench("SA1 ball query FULL-grid",
          lambda s_, c_: S.group_slab(
              s_, c_, seed, sa1.radii[0], sa1.num_neighbours[0], cell,
              win=256, spw=2, distinct=True, grid_span=99), sc, cj)

    flat = S.three_nn_slab(sc.xyz, cj, bound=0.06, flat=True)
    bnd = S.three_nn_slab(sc.xyz, cj, bound=0.06, flat=False)
    print(f"{'FP3 three_nn proven (flat vs bounded)':52s} "
          f"{bool(jnp.all(flat[2]))} vs {bool(jnp.all(bnd[2]))}")
    if bool(jnp.all(flat[2])) and bool(jnp.all(bnd[2])):
        check("FP3 three_nn_slab", flat, bnd)
    bench("FP3 three_nn_slab FLAT",
          lambda q_, k_: S.three_nn_slab(q_, k_, bound=0.06), sc.xyz, cj)
    bench("FP3 three_nn_slab BOUNDED",
          lambda q_, k_: S.three_nn_slab(q_, k_, bound=0.06, flat=False),
          sc.xyz, cj)


if __name__ == "__main__":
    main()
