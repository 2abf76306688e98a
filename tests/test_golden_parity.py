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
