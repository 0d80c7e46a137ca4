"""Dense frame-structured assembly must agree with the generic sparse path."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.solver.dense import (
    assemble_dense,
    dense_graph_from_sim,
    lm_solve_dense,
)
from omniswarm_tpu.solver.gauss_newton import assemble_normal_equations, lm_solve


@pytest.fixture(scope="module")
def problem():
    params = sim.SimParams(num_drones=4, num_frames=20, seed=31)
    data = sim.generate(params)
    sparse_graph, init = sim.build_graph_from_sim(data, enable_detections=True)
    dense_graph = dense_graph_from_sim(data)
    return data, sparse_graph, dense_graph, init


def test_dense_matches_sparse_normal_equations(problem):
    data, sparse_graph, dense_graph, init = problem
    Hs, gs, cs = assemble_normal_equations(sparse_graph, init)
    Hd, gd, cd = assemble_dense(dense_graph, init)
    np.testing.assert_allclose(float(cd), float(cs), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Hd), np.asarray(Hs),
                               rtol=2e-3, atol=5e-2)


def test_dense_matches_sparse_at_perturbed_poses(problem):
    data, sparse_graph, dense_graph, init = problem
    rng = np.random.default_rng(0)
    poses = np.asarray(init) + rng.normal(0, 0.2, size=init.shape).astype(
        np.float32)
    poses = jnp.asarray(poses)
    Hs, gs, cs = assemble_normal_equations(sparse_graph, poses)
    Hd, gd, cd = assemble_dense(dense_graph, poses)
    np.testing.assert_allclose(float(cd), float(cs), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               rtol=2e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(Hd), np.asarray(Hs),
                               rtol=2e-3, atol=5e-2)


def test_dense_solve_accuracy(problem):
    data, _, dense_graph, init = problem
    res = lm_solve_dense(dense_graph, init, max_iterations=60)
    rel = metrics.mean_relative_ate(np.asarray(res.poses), data.gt)
    assert rel < 0.08, (rel, float(res.cost))


def test_dense_solve_matches_sparse_solve(problem):
    data, sparse_graph, dense_graph, init = problem
    rs = lm_solve(sparse_graph, init, max_iterations=40)
    rd = lm_solve_dense(dense_graph, init, max_iterations=40)
    np.testing.assert_allclose(float(rd.cost), float(rs.cost), rtol=5e-2)
    rel_s = metrics.mean_relative_ate(np.asarray(rs.poses), data.gt)
    rel_d = metrics.mean_relative_ate(np.asarray(rd.poses), data.gt)
    assert abs(rel_s - rel_d) < 0.03, (rel_s, rel_d)
