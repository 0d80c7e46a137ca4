"""Sharded (multi-device) solver must match the single-device solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.parallel import make_mesh, sharded_lm_solve
from omniswarm_tpu.solver import lm_solve


@pytest.fixture(scope="module")
def problem():
    params = sim.SimParams(num_drones=4, num_frames=24, seed=7)
    data = sim.generate(params)
    graph, init = sim.build_graph_from_sim(data, enable_detections=True)
    return data, graph, init


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_single_device(problem):
    data, graph, init = problem
    res_single = lm_solve(graph, init, max_iterations=40)
    mesh = make_mesh(8)
    res_shard = sharded_lm_solve(graph, init, mesh, max_iterations=40)
    np.testing.assert_allclose(float(res_shard.cost), float(res_single.cost),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_shard.poses),
                               np.asarray(res_single.poses), atol=5e-3)


def test_sharded_accuracy(problem):
    data, graph, init = problem
    mesh = make_mesh(8)
    res = sharded_lm_solve(graph, init, mesh, max_iterations=40)
    rel = metrics.mean_relative_ate(np.asarray(res.poses), data.gt)
    assert rel < 0.1, rel


def test_sharded_on_subset_mesh(problem):
    _, graph, init = problem
    mesh = make_mesh(4)
    res = sharded_lm_solve(graph, init, mesh, max_iterations=20)
    assert np.isfinite(float(res.cost))


def test_ten_drone_sharded_scaling():
    """BASELINE config 5: 10+ drones, factors sharded across the mesh."""
    params = sim.SimParams(num_drones=10, num_frames=16, seed=9)
    data = sim.generate(params)
    graph, init = sim.build_graph_from_sim(data, enable_detections=True)
    mesh = make_mesh(8)
    res = sharded_lm_solve(graph, init, mesh, max_iterations=30)
    rel = metrics.mean_relative_ate(np.asarray(res.poses), data.gt)
    assert np.isfinite(float(res.cost))
    assert rel < 0.15, rel
