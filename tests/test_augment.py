"""Geometric training augmentation (data/augment.py).

The augmentation must keep every per-point companion (color, score,
label GT) riding with its point through the dropout resample, and must
move the GT grasp frames rigidly with the view cloud — otherwise the
stage-2/3 matching losses would train against misplaced geometry.
"""

import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data.augment import (
    augment_batch, kinect_corrupt, rigid_jitter)
from regnet_for_3d_grasping_tpu.data.dataset import SceneBatch

CAM = np.array([0.8, 0.0, 1.7])


def _view(n=400, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    v[:, 2] = 0.75 + rng.uniform(0.0, 0.15, n)
    return v


def test_kinect_corrupt_zero_is_identity():
    v = _view()
    out, sel = kinect_corrupt(v, CAM, np.random.RandomState(0),
                              return_index=True)
    np.testing.assert_array_equal(out, v)
    np.testing.assert_array_equal(sel, np.arange(len(v)))


def test_kinect_corrupt_axial_moves_along_ray():
    v = _view()
    out = kinect_corrupt(v, CAM, np.random.RandomState(1), axial=1.0)
    d = out - v
    ray = v - CAM
    ray = ray / np.linalg.norm(ray, axis=1, keepdims=True)
    # displacement is parallel to the camera ray
    cross = np.linalg.norm(np.cross(d.astype(np.float64), ray), axis=1)
    assert cross.max() < 1e-6
    # magnitude ~ published sigma (1.2-2mm at these ranges): bound at 5 sigma
    assert 1e-5 < np.abs(d).max() < 0.02


def test_kinect_corrupt_quant_snaps_range():
    v = _view()
    out = kinect_corrupt(v, CAM, np.random.RandomState(2), quant=1.0)
    # quantization is deterministic: re-derive the snapped ranges from
    # the INPUT (the step is a function of the pre-snap range)
    d = v.astype(np.float64) - CAM
    r = np.linalg.norm(d, axis=1, keepdims=True)
    step = np.maximum(2.73e-3 * r**2, 1e-6)
    expect = CAM + d / r * (np.round(r / step) * step)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    assert np.abs(out - v).max() > 1e-4   # it actually moved points


def test_kinect_corrupt_dropout_index_maps_points():
    v = _view()
    out, sel = kinect_corrupt(v, CAM, np.random.RandomState(3),
                              dropout=0.3, return_index=True)
    np.testing.assert_allclose(out, v[sel], atol=1e-6)
    assert len(np.unique(sel)) < len(v)   # replacement duplicated some


def test_rigid_jitter_rotation_is_orthonormal_about_z():
    rot, t = rigid_jitter(np.random.RandomState(4), severity=1.0)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-12)
    np.testing.assert_allclose(rot[2], [0, 0, 1], atol=1e-12)
    assert abs(t[0]) <= 0.05 and abs(t[1]) <= 0.05
    assert -0.06 <= t[2] <= 0.03


def _batch(n=400, g=6, seed=5):
    rng = np.random.RandomState(seed)
    v = _view(n, seed)
    # color/score/label are deterministic functions of the point index so
    # any mis-permutation is detectable
    idx = np.arange(n, dtype=np.float32)
    color = np.stack([idx / n, (idx % 7) / 7.0, (idx % 13) / 13.0], 1)
    frames = np.zeros((g, 3, 4), np.float32)
    for k in range(g):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        frames[k, :, :3] = q
        frames[k, :, 3] = v[rng.randint(n)]
    return SceneBatch(
        pc=np.c_[v, color][None].astype(np.float32),
        score=idx[None].copy(),
        label=(idx % 3)[None].astype(np.float32),
        gt_frames=frames[None],
        gt_scores=np.zeros((1, g, 3), np.float32),
        gt_valid=np.ones((1, g), bool),
        paths=["0005_view_1.p"],
        width=np.full(1, 0.08, np.float32))


def test_augment_batch_severity_zero_is_same_object():
    b = _batch()
    assert augment_batch(b, np.random.RandomState(0), 0.0,
                         CAM[None]) is b


def test_augment_batch_companions_ride_with_points():
    b = _batch()
    out = augment_batch(b, np.random.RandomState(6), 1.0, CAM[None])
    # recover the rigid transform from a GT frame (frames move rigidly)
    rot = out.gt_frames[0, 0, :, :3] @ b.gt_frames[0, 0, :, :3].T
    src = b.pc[0, :, :3]
    pivot = src.mean(0).astype(np.float64)
    pivot[2] = 0.0
    t = out.gt_frames[0, 0, :, 3] - (
        rot @ (b.gt_frames[0, 0, :, 3] - pivot) + pivot)
    # every output point, identified by its score (= original index),
    # must sit within sensor-noise distance of its rigidly-moved source
    sel = out.score[0].astype(int)
    expect = (src[sel] - pivot) @ rot.T + pivot + t
    disp = np.linalg.norm(out.pc[0, :, :3] - expect, axis=1)
    assert disp.max() < 0.02   # mm-scale noise only

    # colors and labels used the same permutation
    n = b.pc.shape[1]
    np.testing.assert_allclose(
        out.pc[0, :, 3], sel / n, atol=1e-6)
    np.testing.assert_array_equal(out.label[0], sel % 3)

    # all GT frames stay orthonormal and move by the same (rot, t)
    for k in range(b.gt_frames.shape[1]):
        rk = out.gt_frames[0, k, :, :3]
        np.testing.assert_allclose(rk @ rk.T, np.eye(3), atol=1e-5)
        ek = rot @ (b.gt_frames[0, k, :, 3] - pivot) + pivot + t
        np.testing.assert_allclose(out.gt_frames[0, k, :, 3], ek,
                                   atol=1e-5)


def test_augment_batch_table_height_varies():
    """The z translation actually moves the table plane (the round-4
    real-data gap: 0000_cloud's table sits at ~0.695, ours at 0.75)."""
    b = _batch()
    zs = []
    rng = np.random.RandomState(7)
    for _ in range(16):
        out = augment_batch(b, rng, 1.0, CAM[None])
        zs.append(out.pc[0, :, 2].min() - b.pc[0, :, 2].min())
    zs = np.array(zs)
    assert zs.min() < -0.02 and zs.max() > 0.005
    assert np.all(np.abs(zs) < 0.07)


def test_cli_flag_wires_augmentation(tmp_path):
    """--geom-aug drives the batch hook in cli/train.py (smoke, tiny)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "regnet_for_3d_grasping_tpu.cli.train",
         "--mode", "pretrain_score", "--tiny", "--epoch", "1",
         "--batch-size", "2", "--synthetic-scenes", "3",
         "--geom-aug", "1.0", "--data-path", str(tmp_path / "data"),
         "--model-path", str(tmp_path / "m"),
         "--log-path", str(tmp_path / "l")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
