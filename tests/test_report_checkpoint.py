"""Eval report generation + estimator checkpoint/resume."""
import os
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.eval.report import evaluate, write_report
from omniswarm_tpu.io.checkpoint import load_estimator, save_estimator
from omniswarm_tpu.swarm import SwarmEstimator

sys.path.insert(0, "tests")
from test_estimator import feed_sim


def test_report_written(tmp_path):
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=61))
    out = write_report(str(tmp_path), data.vio, data.gt, times=data.times,
                       ranges=data.ranges, range_valid=data.range_valid,
                       vio=data.vio)
    assert os.path.exists(tmp_path / "summary.json")
    assert os.path.exists(tmp_path / "fused_err.png")
    assert os.path.exists(tmp_path / "relative_err.png")
    assert out["mean_relative_ate"] > 0
    assert "range_error" in out and out["range_error"]["rmse"] < 0.3


def test_evaluate_perfect_estimate():
    data = sim.generate(sim.SimParams(num_drones=2, num_frames=10, seed=62))
    out = evaluate(data.gt, data.gt)
    assert out["mean_relative_ate"] == 0.0
    for d in out["per_drone"].values():
        assert d["ate_pos"] < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=63))
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 20)
    est.solve()
    path = str(tmp_path / "est.npz")
    save_estimator(est, path)
    est2 = load_estimator(path)
    assert est2.self_id == est.self_id
    assert est2.finish_init == est.finish_init
    assert len(est2.window) == len(est.window)
    assert len(est2.loops) == len(est.loops)
    np.testing.assert_allclose(est2.estimate, est.estimate, atol=1e-6)
    # resumed estimator keeps solving
    out = est2.solve()
    assert out["solved"]
    # and keeps predicting
    pred = est2.predict_swarm(float(data.times[-1]))
    assert len(pred) >= 2
