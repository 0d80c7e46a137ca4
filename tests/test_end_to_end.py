"""End-to-end integration: simulator → factor graph → LM solve → ATE.

Mirrors the reference's primary test tier (closed-loop simulator against the
real solver, SURVEY §4); pass criteria follow the "centimeter-level relative
accuracy" headline claim.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.solver import lm_solve


def run_case(params: sim.SimParams, **graph_kw):
    data = sim.generate(params)
    graph, init = sim.build_graph_from_sim(data, **graph_kw)
    res = lm_solve(graph, init, max_iterations=60)
    return data, np.asarray(res.poses), res


def test_single_drone_vio_chain():
    """Config 1 of BASELINE.json: single-drone window, VIO only."""
    params = sim.SimParams(num_drones=1, num_frames=30, seed=1)
    data, est, res = run_case(params, enable_distance=False,
                              enable_loops=False)
    # With only odometry the solution equals the VIO chain
    assert float(res.cost) < 1e-2
    np.testing.assert_allclose(est, data.vio, atol=2e-2)


def test_two_drone_uwb_detections():
    """Config 2: 2 drones, UWB + mutual detections."""
    params = sim.SimParams(num_drones=2, num_frames=40, seed=2)
    data, est, res = run_case(params, enable_detections=True)
    rel = metrics.mean_relative_ate(est, data.gt)
    vio_rel = metrics.mean_relative_ate(data.vio, data.gt)
    assert rel < 0.12, (rel, vio_rel)
    assert rel < vio_rel, (rel, vio_rel)


def test_five_drone_full_graph():
    """Config 3: 5-drone full graph with loop closures — cm-level relative ATE."""
    params = sim.SimParams(num_drones=5, num_frames=40, seed=3)
    data, est, res = run_case(params, enable_detections=True)
    rel = metrics.mean_relative_ate(est, data.gt)
    vio_rel = metrics.mean_relative_ate(data.vio, data.gt)
    # headline: solver must clean up VIO drift to centimeter-level
    assert rel < 0.08, (rel, vio_rel, float(res.cost))
    assert rel < 0.5 * vio_rel, (rel, vio_rel)
    # absolute (self-frame) ATE after first-pose alignment also bounded
    ate = np.mean([
        metrics.ate_pos(
            metrics.align_first_pose(est[:, d], data.gt[:, d])[:, :3],
            data.gt[:, d, :3])
        for d in range(5)
    ])
    assert ate < 0.15, ate


def test_loop_free_degrades_gracefully():
    params = sim.SimParams(num_drones=3, num_frames=30, seed=4)
    data, est, res = run_case(params, enable_loops=False,
                              enable_detections=True)
    rel = metrics.mean_relative_ate(est, data.gt)
    assert rel < 0.2, rel


def test_metrics_sanity():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(20, 3, 4))
    est = gt + 0.01
    assert metrics.ate_pos(est[:, 0, :3], gt[:, 0, :3]) == pytest.approx(
        np.sqrt(3) * 0.01, rel=1e-6)
    # relative ATE of identical trajectories is 0
    assert metrics.mean_relative_ate(gt, gt) == 0.0
