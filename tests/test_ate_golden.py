"""Golden tests: our ATE evaluator must reproduce the reference's published
numbers (reference README.md:133-163) from its stored trajectories in
/root/reference/tool. These are the exact figures the whole project is
benchmarked against (BASELINE.md)."""

import os

import numpy as np
import pytest

from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate
from orb_slam2_ssd_semantic_tpu.io.tum import associate, read_trajectory

TOOL = "/root/reference/tool"
GT = os.path.join(TOOL, "groundtruth.txt")

pytestmark = pytest.mark.skipif(not os.path.exists(GT), reason="reference data not mounted")


@pytest.mark.parametrize(
    "est,rmse,mean,median,std,emin,emax",
    [
        ("src.txt", 0.702233, 0.582027, 0.521357, 0.393014, 0.077360, 1.477060),
        ("flow.txt", 0.387510, 0.316343, 0.203491, 0.223919, 0.070087, 1.052816),
        ("geom.txt", 0.151517, 0.071659, 0.042710, 0.133515, 0.003843, 0.889372),
    ],
)
def test_reference_published_ate(est, rmse, mean, median, std, emin, emax):
    res = evaluate_ate(GT, os.path.join(TOOL, est))
    assert res.n_pairs == 826
    assert abs(res.rmse - rmse) < 2e-3
    assert abs(res.mean - mean) < 2e-3
    assert abs(res.median - median) < 5e-3
    assert abs(res.std - std) < 2e-3
    assert abs(res.min - emin) < 2e-3
    assert abs(res.max - emax) < 2e-3


def test_associate_is_injective():
    gt_stamps, _, _ = read_trajectory(GT)
    est_stamps, _, _ = read_trajectory(os.path.join(TOOL, "src.txt"))
    matches = associate(gt_stamps, est_stamps)
    a_idx = [a for a, _ in matches]
    b_idx = [b for _, b in matches]
    assert len(set(a_idx)) == len(a_idx)
    assert len(set(b_idx)) == len(b_idx)
    assert all(abs(gt_stamps[a] - est_stamps[b]) < 0.02 for a, b in matches)


def test_sim3_alignment_reduces_error():
    # Umeyama (scale) alignment can only improve on rigid Horn alignment.
    rigid = evaluate_ate(GT, os.path.join(TOOL, "geom.txt"))
    sim3 = evaluate_ate(GT, os.path.join(TOOL, "geom.txt"), with_scale=True)
    assert sim3.rmse <= rigid.rmse + 1e-9
    assert 0.5 < sim3.scale < 1.5
