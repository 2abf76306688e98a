"""Frozen benchmark suite: fingerprints pin the scenes across rounds."""

import numpy as np
import pytest

from regnet_for_3d_grasping_tpu.data.benchmark_suite import (
    SUITE_VERSION,
    generate_scene,
    load_fingerprints,
    scene_fingerprint,
    suite_specs,
    verify_scene,
)

VERSIONS = list(range(1, SUITE_VERSION + 1))


@pytest.mark.parametrize("version", VERSIONS)
def test_fingerprint_file_covers_suite(version):
    fps = load_fingerprints(version)
    assert fps["suite_version"] == version
    names = {s["name"] for s in suite_specs(version)}
    assert set(fps["scenes"]) == names
    regimes = {fps["scenes"][n]["regime"] for n in names}
    assert regimes == {"sparse", "clutter"}


@pytest.mark.parametrize("version", VERSIONS)
def test_generator_matches_committed_fingerprints(version):
    """Canary: regenerate one scene per regime and compare digests — a
    generator change that moves the benchmark fails here, not silently
    in a metrics diff.  BOTH suite versions stay pinned: v1 (iid colors,
    rounds 1-3) and v2 (coherent colors, round 4 on)."""
    fps = load_fingerprints(version)
    specs = suite_specs(version)
    for spec in (specs[0], specs[12]):      # sparse_00, clutter_00
        verify_scene(spec, generate_scene(spec), fps)


def test_v1_v2_differ_only_in_color():
    """The version bump changed ONLY the color channel: geometry, scores
    and GT grasps are identical across v1/v2 of the same scene."""
    s1 = generate_scene(suite_specs(1)[0])
    s2 = generate_scene(suite_specs(2)[0])
    np.testing.assert_array_equal(s1["view_cloud"], s2["view_cloud"])
    np.testing.assert_array_equal(s1["view_cloud_score"],
                                  s2["view_cloud_score"])
    np.testing.assert_array_equal(s1["select_frame"], s2["select_frame"])
    assert not np.array_equal(s1["view_cloud_color"],
                              s2["view_cloud_color"])


def test_fingerprint_sensitivity():
    spec = suite_specs()[0]
    scene = dict(generate_scene(spec))
    base = scene_fingerprint(scene)
    scene["view_cloud"] = np.asarray(scene["view_cloud"]).copy()
    scene["view_cloud"][0, 0] += 1e-4
    assert scene_fingerprint(scene) != base
