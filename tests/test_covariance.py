"""Marginal covariance vs dense-H inverse reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.solver.dense import (
    assemble_dense,
    dense_graph_from_sim,
    lm_solve_bt,
    pose_covariances,
)


@pytest.fixture(scope="module")
def solved():
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=12, seed=121))
    graph = dense_graph_from_sim(data)
    res = lm_solve_bt(graph, jnp.asarray(data.vio, jnp.float32),
                      max_iterations=50)
    return data, graph, res.poses


def test_covariance_matches_dense_inverse(solved):
    data, graph, poses = solved
    F, D = graph.pose_valid.shape
    query = jnp.asarray([[5, 1], [11, 2], [0, 1]], jnp.int32)
    cov = np.asarray(pose_covariances(graph, poses, query))
    H, _, _ = assemble_dense(graph, poses)
    Hinv = np.linalg.inv(np.asarray(H) + 1e-6 * np.eye(H.shape[0]))
    for q, (f, d) in enumerate([(5, 1), (11, 2), (0, 1)]):
        i = 4 * (f * D + d)
        ref = Hinv[i:i + 4, i:i + 4]
        np.testing.assert_allclose(cov[q], ref, rtol=0.05, atol=5e-4)


def test_covariance_properties(solved):
    data, graph, poses = solved
    query = jnp.asarray([[3, 0], [3, 1]], jnp.int32)
    cov = np.asarray(pose_covariances(graph, poses, query))
    # symmetric positive semidefinite, sane magnitudes (cm-scale std devs)
    for c in cov:
        np.testing.assert_allclose(c, c.T, atol=1e-5)
        w = np.linalg.eigvalsh(c)
        assert (w > -1e-6).all()
        assert np.sqrt(np.abs(np.diag(c)[:3])).max() < 1.0


def test_estimator_pose_covariance():
    import sys

    sys.path.insert(0, "tests")
    from test_estimator import feed_sim

    from omniswarm_tpu.config import SolverParams
    from omniswarm_tpu.swarm import SwarmEstimator

    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=131))
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 20)
    out = est.solve()
    assert out["solved"], out
    cov = est.pose_covariance(1)
    assert cov is not None and cov.shape == (4, 4)
    stds = np.sqrt(np.abs(np.diag(cov)))
    assert (stds[:3] < 0.5).all(), stds       # sub-half-meter position std
    # the gauge-anchored self drone at its first frame is exactly fixed
    cov0 = est.pose_covariance(0, frame=0)
    assert np.abs(cov0).max() < 1e-9


def test_solve_publishes_per_drone_covariance():
    """publish_covariance attaches cov diagonals to every accepted solve
    (reference publishes covariance with each fused output,
    swarm_localization_node.cpp:207-422)."""
    import numpy as np

    from omniswarm_tpu import sim
    from omniswarm_tpu.config import SolverParams
    from tests.test_estimator import feed_sim
    from omniswarm_tpu.swarm import SwarmEstimator

    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=9))
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 20)
    out = est.solve()
    assert out["solved"] and out["finish_init"], out
    assert "cov_diag" in out
    assert set(out["cov_diag"]) == {0, 1, 2}
    for d, diag in out["cov_diag"].items():
        assert len(diag) == 4
        assert all(np.isfinite(v) and v >= 0 for v in diag), (d, diag)
    # the gauge-anchored drone at the queried frame is NOT frame 0, so all
    # drones carry nonzero uncertainty; covariances are also cached
    assert est.latest_covariances and 0 in est.latest_covariances

    # knob off -> no covariance work
    est2 = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True,
                                       publish_covariance=False))
    feed_sim(est2, data, 20)
    out2 = est2.solve()
    assert out2["solved"] and "cov_diag" not in out2
