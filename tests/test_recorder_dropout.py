"""Recorder replay + drone dropout robustness."""
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.io.recorder import Recording
from omniswarm_tpu.swarm import LoopRecord, SwarmEstimator

sys.path.insert(0, "tests")
from test_estimator import feed_sim


def test_record_replay_identical_solution(tmp_path):
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=91))
    rec = Recording()
    D = 3
    for k in range(20):
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in range(D) for b in range(D)
                  if a != b and data.range_valid[k, a, b]}
        rec.record_frame(float(data.times[k]), vio, ranges)
    for lp in data.loops:
        rec.loops.append(LoopRecord(
            t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
            t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
            dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
    path = str(tmp_path / "flight.npz")
    rec.save(path)
    rec2 = Recording.load(path)
    assert len(rec2.frames) == 20 and len(rec2.loops) == len(rec.loops)

    est_live = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    rec.replay_into(est_live)
    est_replay = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    rec2.replay_into(est_replay)
    o1, o2 = est_live.solve(), est_replay.solve()
    assert o1["solved"] and o2["solved"]
    np.testing.assert_allclose(est_live.estimate, est_replay.estimate,
                               atol=1e-5)


def test_drone_dropout_mid_window():
    """A drone that disappears mid-flight must not break the solve."""
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=24, seed=92))
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    D = 3
    for k in range(24):
        alive = range(D) if k < 12 else range(D - 1)   # drone 2 drops out
        vio = {d: data.vio[k, d] for d in alive}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in alive for b in alive
                  if a != b and data.range_valid[k, a, b]}
        est.on_swarm_frame(float(data.times[k]), vio, ranges)
    for lp in data.loops:
        if lp.frame_a < 12 and lp.frame_b < 12 or (
                lp.drone_a != 2 and lp.drone_b != 2):
            est.on_loop(LoopRecord(
                t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
                t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
                dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
    out = est.solve()
    assert out["solved"], out
    assert np.isfinite(est.estimate).all()
    # the surviving drones' relative accuracy unaffected
    kf_idx = [int(round(kf.t)) for kf in est.window]
    gt = data.gt[kf_idx]
    rel01 = metrics.relative_ate(est.estimate, gt, 0, 1)
    assert rel01 < 0.15, rel01


def test_late_joining_drone():
    """A drone appearing mid-flight forces a keyframe and gets estimated."""
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=24, seed=93))
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    for k in range(24):
        alive = range(2) if k < 10 else range(3)       # drone 2 joins at 10
        vio = {d: data.vio[k, d] for d in alive}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in alive for b in alive
                  if a != b and data.range_valid[k, a, b]}
        est.on_swarm_frame(float(data.times[k]), vio, ranges)
    for lp in data.loops:
        est.on_loop(LoopRecord(
            t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
            t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
            dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
    out = est.solve()
    assert out["solved"], out
    assert 2 in est.window_ids
