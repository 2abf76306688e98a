"""Photometric augmentation semantics (round 4).

The round-4 real-data evidence (docs/evidence/real_data_r4.json) showed
the score head collapses under a +0.23 global brightness shift when
training colors only ever scale DOWN (the reference's per-class jitter,
scoredataset.py:52-58).  The fix added a scene-level gain/gamma/
brightness augmentation to BOTH loaders (dataset._global_color_aug and
native/loader.cc).  These tests pin its semantics:

  * outputs stay valid colors in [0, 1],
  * the distribution includes genuinely UPWARD shifts (the property the
    reference's jitter lacked and the real-data probe identified),
  * augmentation touches colors only — geometry, scores and labels are
    untouched (native loader: bit-identical at the same seed),
  * augment=False is the identity on colors.
"""

import glob
import os
import tempfile

import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data import (
    GraspDataset,
    write_synthetic_dataset,
)
from regnet_for_3d_grasping_tpu.data.dataset import load_scene


@pytest.fixture(scope="module")
def scene_dir():
    d = tempfile.mkdtemp(prefix="aug_test_")
    write_synthetic_dataset(d, num_scenes=4, num_view=600)
    return d


class TestPythonAugmentation:
    def test_colors_stay_in_unit_range(self, scene_dir):
        ds = GraspDataset(scene_dir, "train", num_points=512,
                          max_gt_grasps=16)
        for seed in range(8):
            pc = ds.get(0, np.random.RandomState(seed), augment=True)[0]
            color = pc[:, 3:]
            assert color.min() >= 0.0 and color.max() <= 1.0

    def test_upward_and_downward_shifts_both_occur(self, scene_dir):
        """The real-data failure mode was brightness UP; the reference's
        jitter only ever darkens.  Across seeds the augmented scene mean
        must land both above and below the unaugmented mean."""
        ds = GraspDataset(scene_dir, "train", num_points=512,
                          max_gt_grasps=16)
        base = ds.get(0, np.random.RandomState(0), augment=False)[0]
        base_mean = base[:, 3:].mean()
        means = [ds.get(0, np.random.RandomState(s), augment=True)[0][
            :, 3:].mean() for s in range(40)]
        assert max(means) > base_mean + 0.05, (max(means), base_mean)
        assert min(means) < base_mean - 0.05, (min(means), base_mean)

    def test_global_aug_is_monotone_per_channel(self):
        """gain/clip/gamma/offset/clip is monotone non-decreasing in the
        input — augmentation must not invert relative brightness within
        a channel (object texture stays texture)."""
        from regnet_for_3d_grasping_tpu.data.dataset import GraspDataset
        rng = np.random.RandomState(3)
        ramp = np.linspace(0, 1, 64, dtype=np.float32)
        color = np.stack([ramp] * 3, axis=1)
        out = GraspDataset._global_color_aug(None, rng, color)
        for ch in range(3):
            assert (np.diff(out[:, ch]) >= -1e-6).all()

    def test_augment_false_is_identity_on_colors(self, scene_dir):
        ds = GraspDataset(scene_dir, "train", num_points=512,
                          max_gt_grasps=16)
        pc = ds.get(0, np.random.RandomState(5), augment=False)[0]
        scene = load_scene(ds.paths[0])
        rows = {r.tobytes() for r in
                scene["view_cloud_color"].astype(np.float32)}
        got = pc[:, 3:].astype(np.float32)
        assert all(r.tobytes() in rows for r in got)


class TestNativeAugmentation:
    @pytest.fixture(scope="class")
    def rsc(self, scene_dir):
        from regnet_for_3d_grasping_tpu.data.native_loader import (
            build_library, convert_dataset)
        if build_library() is None:
            pytest.skip("g++ unavailable")
        paths = sorted(glob.glob(
            os.path.join(scene_dir, "training_data", "*.p")))
        return convert_dataset(paths, os.path.join(scene_dir, "cache"))

    def test_augment_touches_colors_only(self, rsc):
        """Same seed, augment on/off: the RNG draws happen either way
        (loader.cc draws factors before the augment gate), so the point
        resample is identical — xyz/score/label must be bit-identical
        and only the color channels may move."""
        from regnet_for_3d_grasping_tpu.data.native_loader import (
            NativeLoader)
        a = NativeLoader(rsc, batch_size=2, num_points=512,
                         max_grasps=16, seed=11, augment=True)
        b = NativeLoader(rsc, batch_size=2, num_points=512,
                         max_grasps=16, seed=11, augment=False)
        ba, bb = a.next_batch(), b.next_batch()
        a.close(), b.close()
        assert ba.paths == bb.paths
        np.testing.assert_array_equal(ba.pc[..., :3], bb.pc[..., :3])
        np.testing.assert_array_equal(ba.score, bb.score)
        np.testing.assert_array_equal(ba.label, bb.label)
        assert np.abs(ba.pc[..., 3:] - bb.pc[..., 3:]).max() > 1e-3

    def test_native_colors_stay_in_unit_range(self, rsc):
        from regnet_for_3d_grasping_tpu.data.native_loader import (
            NativeLoader)
        loader = NativeLoader(rsc, batch_size=2, num_points=512,
                              max_grasps=16, seed=2, augment=True)
        for _ in range(4):
            c = loader.next_batch().pc[..., 3:]
            assert c.min() >= 0.0 and c.max() <= 1.0
        loader.close()

    def test_native_augmentation_shifts_both_ways(self, rsc):
        """The C++ stream must also produce upward brightness shifts."""
        from regnet_for_3d_grasping_tpu.data.native_loader import (
            NativeLoader)
        base = NativeLoader(rsc, batch_size=1, num_points=512,
                            max_grasps=16, seed=1, augment=False)
        means0 = {}
        for _ in range(4):
            nb = base.next_batch()
            means0[nb.paths[0]] = nb.pc[..., 3:].mean()
        base.close()
        deltas = []
        for seed in range(10):
            loader = NativeLoader(rsc, batch_size=1, num_points=512,
                                  max_grasps=16, seed=seed, augment=True)
            for _ in range(4):
                nb = loader.next_batch()
                if nb.paths[0] in means0:
                    deltas.append(nb.pc[..., 3:].mean()
                                  - means0[nb.paths[0]])
            loader.close()
        deltas = np.asarray(deltas)
        assert deltas.max() > 0.03 and deltas.min() < -0.03, deltas
