"""Estimator-level DA-init + observability gating."""
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.robust.da_init import ANONYMOUS_ID_BASE
from omniswarm_tpu.swarm import DetRecord, SwarmEstimator

sys.path.insert(0, "tests")
from test_estimator import feed_sim


def bearing_from(gt, k, a, b, rng=None):
    pa, pb = gt[k, a], gt[k, b]
    c, s = np.cos(-pa[3]), np.sin(-pa[3])
    d = pb[:3] - pa[:3]
    rel = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
    n = np.linalg.norm(rel)
    u = rel / n
    if rng is not None:
        u += rng.normal(0, 0.005, 3)
        u /= np.linalg.norm(u)
    return u, 1.0 / n


def test_anonymous_detections_resolved_and_used():
    rng = np.random.default_rng(0)
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=25, seed=81))
    est = SwarmEstimator(SolverParams(
        self_id=0, enable_data_association=True, pcm_redundant=True))
    feed_sim(est, data, 25)
    # drone 0 sees drones 1 and 2 but does not know who they are
    anon_dets = {}
    for k in range(5, 25, 5):
        for target, anon in ((1, ANONYMOUS_ID_BASE + 11),
                             (2, ANONYMOUS_ID_BASE + 22)):
            u, idep = bearing_from(data.gt, k, 0, target, rng)
            rec = DetRecord(
                t=float(data.times[k]), drone_a=0, drone_b=anon,
                direction=u, inv_dep=idep)
            est.on_detection(rec)
            anon_dets[id(rec)] = target
    out = est.solve()
    assert out["solved"], out
    resolved = [d for d in est.dets if id(d) in anon_dets
                and d.drone_b < ANONYMOUS_ID_BASE]
    assert len(resolved) >= len(anon_dets) // 2, (len(resolved),
                                                  len(anon_dets))
    # resolved ids must be the correct targets
    for d in resolved:
        assert d.drone_b == anon_dets[id(d)], (d.drone_b, anon_dets[id(d)])


def test_unobservable_single_spot_refuses_solve():
    """No loops, no detections, hovering self → estimator declines."""
    est = SwarmEstimator(SolverParams(self_id=0))
    for k in range(8):
        vio = {0: np.array([0.0, 0, 1, 0]) + k * 1e-4,
               1: np.array([3.0, 0, 1, 0])}
        est.on_swarm_frame(float(k), vio, {(0, 1): 3.0, (1, 0): 3.0})
    out = est.solve()
    assert not out["solved"]
    assert "unobservable" in out["reason"]


def test_motion_makes_system_solvable():
    data = sim.generate(sim.SimParams(num_drones=2, num_frames=20, seed=82))
    # sim circles have little z motion; relax the z gate as PC-replay
    # configs do (init_z_movement is a launch arg in the reference)
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True,
                                      init_z_movement=0.1))
    feed_sim(est, data, 20)
    # circling motion satisfies the bounding-box condition even with no loops
    est.loops.clear()
    est.dets.clear()
    out = est.solve()
    assert out["solved"], out
