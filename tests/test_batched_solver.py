"""Batch-native dense LM: lanes match independent solves."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.solver.dense import (
    dense_graph_from_sim,
    lm_solve_dense,
    lm_solve_dense_batched,
)


@pytest.fixture(scope="module")
def problem():
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=16, seed=41))
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    return data, graph, init


def test_batched_matches_single(problem):
    data, graph, init = problem
    rng = np.random.default_rng(0)
    B = 4
    inits = np.tile(np.asarray(init)[None], (B, 1, 1, 1))
    for b in range(1, B):
        inits[b, :, 1:, :3] += rng.normal(0, 0.3, size=(16, 2, 3))
    inits = jnp.asarray(inits)
    rb = lm_solve_dense_batched(graph, inits, max_iterations=40)
    assert rb.poses.shape == inits.shape
    for b in range(B):
        rs = lm_solve_dense(graph, inits[b], max_iterations=40)
        np.testing.assert_allclose(float(rb.cost[b]), float(rs.cost),
                                   rtol=0.05, atol=0.5)


def test_batched_accuracy(problem):
    data, graph, init = problem
    B = 3
    inits = jnp.tile(init[None], (B, 1, 1, 1))
    rb = lm_solve_dense_batched(graph, inits, max_iterations=40)
    for b in range(B):
        rel = metrics.mean_relative_ate(np.asarray(rb.poses[b]), data.gt)
        assert rel < 0.1, rel
