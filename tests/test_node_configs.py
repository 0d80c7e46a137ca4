"""Per-node capability/calibration semantics (swarm_nodes5.yaml)."""
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import NodeConfig, SolverParams
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.swarm import SwarmEstimator

sys.path.insert(0, "tests")
from test_estimator import feed_sim


def test_uwb_bias_scale_calibration():
    data = sim.generate(sim.SimParams(num_drones=2, num_frames=20, seed=111))
    # corrupt ranges with a known bias+scale from drone 0's radio to drone 1
    nc = {0: NodeConfig(drone_id=0, uwb_bias={1: 0.5},
                        uwb_scale={1: 1.05})}
    est_cal = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True),
                             node_configs=nc)
    est_raw = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    D = 2
    for k in range(20):
        vio = {d: data.vio[k, d] for d in range(D)}
        true_d = float(np.linalg.norm(
            data.gt[k, 0, :3] - data.gt[k, 1, :3]))
        corrupted = 0.5 + 1.05 * true_d
        ranges = {(0, 1): corrupted, (1, 0): corrupted}
        est_cal.on_swarm_frame(float(data.times[k]), vio, dict(ranges))
        est_raw.on_swarm_frame(float(data.times[k]), vio, dict(ranges))
    # calibrated estimator recovers the true distances
    for kf in est_cal.window:
        t_idx = int(round(kf.t))
        true_d = float(np.linalg.norm(
            data.gt[t_idx, 0, :3] - data.gt[t_idx, 1, :3]))
        assert abs(kf.ranges[(0, 1)] - true_d) < 1e-6
    # uncalibrated keeps the corrupted value
    kf0 = est_raw.window[0]
    assert abs(kf0.ranges[(0, 1)] - (0.5 + 1.05 * np.linalg.norm(
        data.gt[0, 0, :3] - data.gt[0, 1, :3]))) < 1e-6


def test_static_anchor_node():
    """A static UWB anchor (no VO) stays put and aids the moving drones."""
    rng = np.random.default_rng(5)
    data = sim.generate(sim.SimParams(num_drones=2, num_frames=24, seed=112))
    anchor_pos = np.array([0.0, 0.0, 0.5, 0.0])
    nc = {2: NodeConfig(drone_id=2, has_vo=False, is_static=True)}
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True,
                                      init_z_movement=0.05),
                         node_configs=nc)
    D = 2
    for k in range(24):
        vio = {d: data.vio[k, d] for d in range(D)}
        # the anchor reports a constant (noisy-init) pose as its "vio"
        vio[2] = anchor_pos + np.concatenate([rng.normal(0, 0.01, 3), [0]])
        ranges = {}
        for a in range(D):
            d_true = float(np.linalg.norm(
                data.gt[k, a, :3] - anchor_pos[:3]))
            ranges[(a, 2)] = d_true + rng.normal(0, 0.05)
            ranges[(2, a)] = ranges[(a, 2)]
        for a in range(D):
            for b in range(D):
                if a != b and data.range_valid[k, a, b]:
                    ranges[(a, b)] = float(data.ranges[k, a, b])
        est.on_swarm_frame(float(data.times[k]), vio, ranges)
    for lp in data.loops:
        from omniswarm_tpu.swarm import LoopRecord

        est.on_loop(LoopRecord(
            t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
            t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
            dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
    out = est.solve()
    assert out["solved"], out
    # the anchor's estimated positions are (nearly) identical across frames
    ai = est.window_ids.index(2)
    anchor_est = est.estimate[:, ai, :3]
    spread = np.linalg.norm(anchor_est - anchor_est.mean(0), axis=1).max()
    assert spread < 0.05, spread
    # moving drones still accurate
    kf_idx = [int(round(kf.t)) for kf in est.window]
    rel = metrics.relative_ate(est.estimate[:, :2], data.gt[kf_idx], 0, 1)
    assert rel < 0.15, rel
