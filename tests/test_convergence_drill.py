"""benchmarks/convergence_drill.py smoke: the lockstep ours-vs-torch-twins
protocol runs end to end on a tiny tree and produces a well-formed verdict.

The full drill (300 steps, 64^2; VERDICT r4 #1/#3) is a recorded run in
BENCH_NOTES; this guards the harness itself — its first recorded run died
on a loader-batch dtype the 10-step trajectory tests never exercised.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.convergence_drill import run as drill_run  # noqa: E402


import pytest


@pytest.mark.parametrize("dataset", ["fundus", "prostate"])
def test_convergence_drill_smoke(dataset):
    r = drill_run(steps=2, eval_every=2, hw=32, dataset=dataset)
    assert r["dataset"] == dataset
    assert r["steps"] == 2
    assert len(r["eval_points"]) == 1
    p = r["eval_points"][0]
    # all four trajectories evaluated and produced sane dice values
    for k in ("dice_ours", "dice_torch", "dice_env", "dice_env2"):
        assert 0.0 <= p[k] <= 1.0
    assert r["overall"] in ("PASS", "FAIL")
    # two steps from identical init cannot diverge past the fp envelope
    # (the first prostate smoke caught exactly this: a thr-0.75-vs-0.5
    # eval mismatch read as a 0.26 dice divergence)
    assert r["overall"] == "PASS"
