"""Schema parity against the reference's committed golden outputs.

The reference ships prediction pickles under ``test_file/*_predict``
(test.py:143-148, utils.py:412-424).  No trained weights are shipped, so
value parity is impossible — these tests pin down STRUCTURAL parity: our
pipeline consumes the same inputs and emits artifacts with exactly the
golden schema, shapes and invariants.
"""

import os
import pickle

import numpy as np
import pytest

REF = "/root/reference/test_file"
GOLDEN_VIRTUAL = os.path.join(REF, "virtual_data_predict",
                              "00001_view_1.p")
GOLDEN_REAL = os.path.join(REF, "real_data_predict", "0000_cloud.p")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_VIRTUAL), reason="reference not mounted")

GOLDEN_KEYS = ["points", "colors", "scores", "grasp_stage2",
               "grasp_stage3_stage2", "grasp_stage3", "grasp_stage3_score"]


def load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


class TestGoldenSchema:
    def test_golden_keys_documented(self):
        for path in (GOLDEN_VIRTUAL, GOLDEN_REAL):
            d = load(path)
            assert set(GOLDEN_KEYS) <= set(d.keys())
            assert d["scores"].shape == (25600, 1)
            for k in GOLDEN_KEYS[3:]:
                assert d[k].ndim == 2 and d[k].shape[1] == 8

    def test_pipeline_reproduces_golden_schema(self, tmp_path):
        """Run our full inference on the golden cloud (its points/colors
        are the original inputs) and compare artifact structure."""
        import jax
        jax.config.update("jax_platforms", "cpu")

        golden = load(GOLDEN_VIRTUAL)
        scene = {"view_cloud": golden["points"].astype(np.float32),
                 "view_cloud_color": golden["colors"].astype(np.float32)}
        in_dir = tmp_path / "virtual_data"
        in_dir.mkdir()
        with open(in_dir / "00001_view_1.p", "wb") as f:
            pickle.dump(scene, f)

        from regnet_for_3d_grasping_tpu.cli import infer
        infer.main(["--folder-name", str(in_dir),
                    "--center-num", "64", "--group-num-more", "256",
                    "--all-points-num", "25600"])

        out = load(tmp_path / "virtual_data_predict" / "00001_view_1.p")
        assert set(GOLDEN_KEYS) <= set(out.keys())
        assert out["scores"].shape == golden["scores"].shape
        assert out["points"].shape == golden["points"].shape
        for k in GOLDEN_KEYS[3:]:
            assert out[k].ndim == 2 and out[k].shape[1] == 8
            assert out[k].dtype == np.float32
        # scores come from a sigmoid
        assert (out["scores"] >= 0).all() and (out["scores"] <= 1).all()
        # any surviving grasp must have a unit axis_y
        for k in GOLDEN_KEYS[3:]:
            if len(out[k]):
                n = np.linalg.norm(out[k][:, 3:6], axis=1)
                np.testing.assert_allclose(n, 1.0, atol=1e-3)

    def test_grasp_vectors_decode(self):
        """Golden grasps decode through our codec into orthonormal frames
        (format compatibility both ways)."""
        import jax.numpy as jnp
        from regnet_for_3d_grasping_tpu.geometry import grasps_to_frames

        d = load(GOLDEN_REAL)
        grasps = d["grasp_stage3"]
        assert len(grasps) > 0
        frames, centers = grasps_to_frames(jnp.asarray(grasps[:, :8]))
        frames = np.asarray(frames)
        eye = np.einsum("nij,nik->njk", frames, frames)
        np.testing.assert_allclose(
            eye, np.tile(np.eye(3), (len(grasps), 1, 1)), atol=1e-3)


class TestRealGoldenRoundTrip:
    """The REAL-data golden (test.py:101-118 path): reconstruct the .pcd
    input from the committed prediction pickle's points/colors, run our
    full real-data pipeline (pcd read -> camera transform -> workspace
    crop -> resample -> cascade), and pin the output schema + the
    preprocessing invariants (VERDICT r2 item 6 / missing #3)."""

    def _write_pcd(self, path, pts_cam, colors):
        rgb = (np.clip(colors, 0, 1) * 255).round().astype(np.uint32)
        packed = (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]
        arr = np.zeros(len(pts_cam),
                       dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                              ("rgb", "u4")])
        arr["x"], arr["y"], arr["z"] = pts_cam.astype(np.float32).T
        arr["rgb"] = packed
        with open(path, "wb") as f:
            f.write(b"VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
                    b"TYPE F F F U\nCOUNT 1 1 1 1\n"
                    + f"WIDTH {len(arr)}\nHEIGHT 1\nPOINTS {len(arr)}\n"
                    .encode() + b"DATA binary\n")
            f.write(arr.tobytes())

    def test_real_pipeline_roundtrip(self, tmp_path):
        import jax
        jax.config.update("jax_platforms", "cpu")

        from regnet_for_3d_grasping_tpu.utils import pcd as pcdio

        golden = load(GOLDEN_REAL)
        # the real-data golden stores the PRE-resample cropped cloud
        # (utils.py:412-424 saves pc_back for .pcd inputs): 81742 points
        pts_global = golden["points"].astype(np.float64)
        colors = golden["colors"].astype(np.float64)
        assert len(pts_global) > 25600 and pts_global.shape[1] == 3

        # the pipeline applies the Kinect camera->global transform
        # (utils.py:433-440); invert it to synthesize the camera-frame
        # .pcd the reference consumed
        T = pcdio.camera_to_global_transform()
        Tinv = np.linalg.inv(T)
        pts_cam = pcdio.transform_points(Tinv, pts_global)
        # sanity: the transform round-trips
        np.testing.assert_allclose(
            pcdio.transform_points(T, pts_cam), pts_global, atol=1e-9)

        in_dir = tmp_path / "real_data"
        in_dir.mkdir()
        self._write_pcd(in_dir / "0000_cloud.pcd", pts_cam, colors)

        from regnet_for_3d_grasping_tpu.cli import infer
        infer.main(["--folder-name", str(in_dir),
                    "--center-num", "64", "--group-num-more", "256",
                    "--all-points-num", "25600"])

        out = load(tmp_path / "real_data_predict" / "0000_cloud.p")
        assert set(GOLDEN_KEYS) <= set(out.keys())
        assert out["points"].shape == golden["points"].shape
        assert out["scores"].shape == golden["scores"].shape
        for k in GOLDEN_KEYS[3:]:
            assert out[k].ndim == 2 and out[k].shape[1] == 8
            assert out[k].dtype == np.float32

        # preprocessing invariants: every kept point passed the workspace
        # crop (test.py:114-118) and came from the golden cloud (within
        # the 1/255 color quantization of the synthesized .pcd)
        p = out["points"]
        assert (p[:, 0] < 0.26).all() and (p[:, 0] > -0.4).all()
        assert (p[:, 2] < 1).all()
        assert (p[:, 1] < 0.65).all() and (p[:, 1] > 0.2).all()
        # golden points are already inside the crop -> none dropped: the
        # saved real-data cloud is the full crop survivor set, matching
        # the golden's count exactly
        assert len(p) == len(pts_global)
        # and it IS the golden cloud (round-trip through the camera
        # frame is lossless to f32 rounding)
        np.testing.assert_allclose(p, pts_global.astype(np.float32),
                                   atol=1e-5)
        if len(out["grasp_stage2"]):
            n = np.linalg.norm(out["grasp_stage2"][:, 3:6], axis=1)
            np.testing.assert_allclose(n, 1.0, atol=1e-3)
