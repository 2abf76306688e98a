"""Frozen benchmark suite: fingerprints pin the scenes across rounds."""

import numpy as np

from regnet_for_3d_grasping_tpu.data.benchmark_suite import (
    SUITE_VERSION,
    generate_scene,
    load_fingerprints,
    scene_fingerprint,
    suite_specs,
    verify_scene,
)


def test_fingerprint_file_covers_suite():
    fps = load_fingerprints()
    assert fps["suite_version"] == SUITE_VERSION
    names = {s["name"] for s in suite_specs()}
    assert set(fps["scenes"]) == names
    regimes = {fps["scenes"][n]["regime"] for n in names}
    assert regimes == {"sparse", "clutter"}


def test_generator_matches_committed_fingerprints():
    """Canary: regenerate one scene per regime and compare digests — a
    generator change that moves the benchmark fails here, not silently
    in a metrics diff."""
    fps = load_fingerprints()
    specs = suite_specs()
    for spec in (specs[0], specs[12]):      # sparse_00, clutter_00
        verify_scene(spec, generate_scene(spec), fps)


def test_fingerprint_sensitivity():
    spec = suite_specs()[0]
    scene = dict(generate_scene(spec))
    base = scene_fingerprint(scene)
    scene["view_cloud"] = np.asarray(scene["view_cloud"]).copy()
    scene["view_cloud"][0, 0] += 1e-4
    assert scene_fingerprint(scene) != base
