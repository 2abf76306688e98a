"""Native C++ loader: build, conversion, batch correctness, throughput."""

import glob
import os
import tempfile
import time

import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import (
    GraspDataset,
    write_synthetic_dataset,
)
from regnet_for_3d_grasping_tpu.data.native_loader import (
    NativeLoader,
    build_library,
    convert_dataset,
)

pytestmark = pytest.mark.skipif(
    build_library() is None, reason="g++ unavailable")


@pytest.fixture(scope="module")
def setup():
    d = tempfile.mkdtemp(prefix="rsc_test_")
    write_synthetic_dataset(d, num_scenes=6, num_view=600)
    paths = sorted(glob.glob(os.path.join(d, "training_data", "*.p")))
    rsc = convert_dataset(paths, os.path.join(d, "cache"))
    return d, paths, rsc


class TestNativeLoader:
    def test_batch_contents(self, setup):
        d, paths, rsc = setup
        loader = NativeLoader(rsc, batch_size=2, num_points=512,
                              max_grasps=32, seed=7)
        b = loader.next_batch()
        assert b.pc.shape == (2, 512, 6)
        assert np.isfinite(b.pc).all()
        assert (np.abs(b.score) <= 1).all()          # tanh applied
        assert b.gt_valid.any()
        # grasp frames are rotations + translation
        v = b.gt_valid[0]
        fr = b.gt_frames[0][v][:, :3, :3]
        eye = np.einsum("nij,nik->njk", fr, fr)
        np.testing.assert_allclose(
            eye, np.tile(np.eye(3), (len(fr), 1, 1)), atol=1e-4)
        loader.close()

    def test_points_come_from_scene(self, setup):
        d, paths, rsc = setup
        from regnet_for_3d_grasping_tpu.data.dataset import load_scene
        loader = NativeLoader(rsc, batch_size=1, num_points=256,
                              max_grasps=32, seed=1, augment=False)
        b = loader.next_batch()
        scene = load_scene(
            b.paths[0].replace("cache", "training_data").replace(
                ".rsc", ".p"))
        view = scene["view_cloud"].astype(np.float32)
        # every sampled xyz must be an exact row of the source cloud
        rows = {r.tobytes() for r in view}
        got = b.pc[0, :, :3].astype(np.float32)
        assert all(r.tobytes() in rows for r in got)
        loader.close()

    def test_epoch_shuffling_changes_order(self, setup):
        d, paths, rsc = setup
        loader = NativeLoader(rsc, batch_size=2, num_points=128,
                              max_grasps=32, seed=3)
        seen = [tuple(loader.next_batch().paths) for _ in range(6)]
        assert len(set(seen)) > 1
        loader.close()

    def test_matches_python_loader_statistics(self, setup):
        d, paths, rsc = setup
        ds = GraspDataset(d, "train", num_points=512, max_gt_grasps=32)
        pyb = next(ds.batches(2, seed=0))
        loader = NativeLoader(rsc, batch_size=2, num_points=512,
                              max_grasps=32, seed=0)
        nb = loader.next_batch()
        # same dataset -> same value ranges and score distribution scale
        assert abs(pyb.pc[..., 2].mean() - nb.pc[..., 2].mean()) < 0.05
        assert abs(pyb.score.mean() - nb.score.mean()) < 0.1
        loader.close()

    def test_throughput_faster_than_python(self, setup):
        d, paths, rsc = setup
        ds = GraspDataset(d, "train", num_points=512, max_gt_grasps=32)
        t0 = time.perf_counter()
        n = 0
        for _ in range(3):
            for _ in ds.batches(2, seed=0):
                n += 1
        t_py = (time.perf_counter() - t0) / n

        loader = NativeLoader(rsc, batch_size=2, num_points=512,
                              max_grasps=32, seed=0)
        loader.next_batch()              # warm the prefetch
        t0 = time.perf_counter()
        for _ in range(n):
            loader.next_batch()
        t_cc = (time.perf_counter() - t0) / n
        loader.close()
        print(f"python {t_py*1000:.2f} ms/batch vs native "
              f"{t_cc*1000:.2f} ms/batch")
        assert t_cc < t_py
