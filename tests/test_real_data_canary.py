"""Real-data canary (VERDICT r3 item 3): the reference's committed real
Kinect grasp sets (test_file/real_data_predict/000{0,1}_cloud.p,
produced by the reference's own trained model via test.py:143-148) must
keep passing OUR evaluator's view-collision funnel at the pinned rates.

This is pure deterministic geometry — no model forward — so it pins the
evaluator's reference-compatibility: a regression in the collision
checker, the grasp decode, or the table test moves these counts.
Computed numbers live in docs/evidence/real_data_r4.json
(tools/real_data_evidence.py)."""

import json
import os

import numpy as np
import pytest

REF_DIR = "/root/reference/test_file/real_data_predict"
EVIDENCE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "evidence", "real_data_r4.json")

# exact funnel counts of the reference's grasp_stage3 sets under our
# evaluator (test-path settings: require_close_region=False, table +1)
PINNED = {
    "0000_cloud": {"above_table": 416, "close_points": 555,
                   "back_ok": 555, "finger_ok": 546,
                   "close_region_ok": 513, "survive": 416, "total": 555},
    "0001_cloud": {"above_table": 147, "close_points": 147,
                   "back_ok": 147, "finger_ok": 147,
                   "close_region_ok": 147, "survive": 147, "total": 147},
}
TOL = 3   # radius-boundary slack between backends


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference real-data goldens not mounted")
class TestReferenceFunnelCanary:
    @pytest.mark.parametrize("name", sorted(PINNED))
    def test_reference_stage3_funnel(self, name):
        import pickle

        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(EVIDENCE),
                                        "..", ".."))
        from tools.real_data_evidence import reference_funnel

        with open(os.path.join(REF_DIR, name + ".p"), "rb") as f:
            golden = pickle.load(f)
        got = reference_funnel(np.asarray(golden["points"], np.float32),
                               np.asarray(golden["grasp_stage3"],
                                          np.float32))
        for key, want in PINNED[name].items():
            assert abs(got[key] - want) <= TOL, (name, key, got[key], want)

    def test_retrained_artifact_invariants(self):
        """The round-4 retrained evidence (r4_coherent weights on the
        reference's real Kinect clouds) must keep its qualitative wins
        over the round-3 collapse: score spread across bins, non-empty
        stage-3 output, and surviving grasps on both clouds."""
        path = EVIDENCE.replace("real_data_r4.json",
                                "real_data_r4_retrained.json")
        with open(path) as f:
            report = json.load(f)
        for name in PINNED:
            entry = report["clouds"][name]
            hist = entry["score_hist_ours"]
            nonzero = sum(1 for h in hist if h > 0)
            assert nonzero >= 6, (name, hist)   # r3 collapse: 1 bin
            assert entry["counts"]["ours_stage3"] > 0, name
            funnel3 = entry["funnel"]["ours_grasp_stage3"]
            assert funnel3["survive"] > 0, (name, funnel3)
            # reference funnel must stay pinned in this artifact too
            got = entry["funnel"]["reference_grasp_stage3"]
            for key, val in PINNED[name].items():
                assert abs(got[key] - val) <= TOL, (name, key)

    def test_committed_artifact_matches(self):
        """The committed evidence file's reference funnels equal the
        pinned counts and the 'ours' entries exist for both clouds."""
        with open(EVIDENCE) as f:
            report = json.load(f)
        for name, want in PINNED.items():
            entry = report["clouds"][name]
            got = entry["funnel"]["reference_grasp_stage3"]
            for key, val in want.items():
                assert abs(got[key] - val) <= TOL, (name, key)
            assert "ours_grasp_stage2" in entry["funnel"]
            assert entry["counts"]["ours_stage2"] > 0


class TestRound5Floors:
    """Round-5 real-data floors (VERDICT r4 weak item 2: 'once item 1
    improves the number, pin the floor').  The committed knobs evidence
    (weights r5_real + center_min_z 0.75 + pose_search 8,
    docs/evidence/real_data_r5_knobs.json) measured stage-2 funnel
    survivors 241/4000 (0000_cloud) and 257/4000 (0001_cloud) — up from
    round 4's 16 and 6.  Future evidence regenerations must not regress
    below these floors (small slack for backend/radius-boundary noise).
    """

    FLOORS = {"0000_cloud": 220, "0001_cloud": 230}

    def _load(self, basename):
        path = EVIDENCE.replace("real_data_r4.json", basename)
        if not os.path.exists(path):
            pytest.skip(f"{basename} not present")
        with open(path) as f:
            return json.load(f)

    def test_knobs_artifact_stage2_floor(self):
        report = self._load("real_data_r5_knobs.json")
        for name, floor in self.FLOORS.items():
            f2 = report["clouds"][name]["funnel"]["ours_grasp_stage2"]
            assert f2["survive"] >= floor, (name, f2)

    def test_knobs_artifact_precision(self):
        """Pin precision (survivors/total), not only counts: stage-2
        precision at least 5% on both clouds (round 4 was 0.5-2.4%)."""
        report = self._load("real_data_r5_knobs.json")
        for name in self.FLOORS:
            f2 = report["clouds"][name]["funnel"]["ours_grasp_stage2"]
            assert f2["survive"] / f2["total"] >= 0.05, (name, f2)

    def test_knobs_artifact_centers_overlap_reference(self):
        """Round 4's 0.0 center overlap is gone: most of the reference
        model's grasp centers now lie within tolerance of one of ours
        (a_within_tol in the evidence = reference->ours coverage)."""
        report = self._load("real_data_r5_knobs.json")
        ov = report["clouds"]["0000_cloud"]["center_overlap"]
        assert ov["a_within_tol"] >= 0.9, ov


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference real-data goldens not mounted")
def test_reference_sets_are_post_funnel_artifacts():
    """Serving-protocol pin (round 5): the reference's committed real-
    data pickles are POST-funnel — eval_notruth (utils.py:391-425)
    filters every set through eval_test before saving.  The saved set
    sizes are therefore funnel-survivor counts out of center_num=4000
    proposals; any capability comparison must put OUR funnel-survivor
    counts against THESE numbers (tools/real_data_evidence.py
    serving_protocol block)."""
    import pickle

    SAVED = {
        "0000_cloud": {"grasp_stage2": 698, "grasp_stage3": 555,
                       "grasp_stage3_stage2": 523,
                       "grasp_stage3_score": 396},
        "0001_cloud": {"grasp_stage2": 364, "grasp_stage3": 147,
                       "grasp_stage3_stage2": 97,
                       "grasp_stage3_score": 3},
    }
    for name, want in SAVED.items():
        with open(os.path.join(REF_DIR, name + ".p"), "rb") as f:
            golden = pickle.load(f)
        for key, n in want.items():
            assert len(np.asarray(golden[key])) == n, (name, key)
