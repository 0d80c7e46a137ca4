"""Fleet batch solving: per-lane graphs, mesh-sharded batch axis."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.parallel.swarm_batch import solve_fleet, stack_graphs
from omniswarm_tpu.parallel import make_mesh
from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt


@pytest.fixture(scope="module")
def fleet():
    datas, graphs, inits = [], [], []
    for seed in range(8):
        data = sim.generate(sim.SimParams(
            num_drones=3, num_frames=16, seed=100 + seed))
        # pad loop capacity to a common static shape across the fleet
        graphs.append(dense_graph_from_sim(data, max_loops=32))
        inits.append(jnp.asarray(data.vio, jnp.float32))
        datas.append(data)
    return datas, graphs, inits


def test_fleet_matches_individual_solves(fleet):
    datas, graphs, inits = fleet
    res = solve_fleet(graphs[:4], inits[:4], max_iterations=40)
    for b in range(4):
        single = lm_solve_bt(graphs[b], inits[b], max_iterations=40)
        np.testing.assert_allclose(float(res.cost[b]), float(single.cost),
                                   rtol=0.05, atol=0.5)
        rel = metrics.mean_relative_ate(np.asarray(res.poses[b]),
                                        datas[b].gt)
        assert rel < 0.1, (b, rel)


def test_fleet_sharded_over_mesh(fleet):
    datas, graphs, inits = fleet
    mesh = make_mesh(8)
    res = solve_fleet(graphs, inits, mesh=mesh, max_iterations=40)
    assert res.poses.shape[0] == 8
    for b in range(8):
        rel = metrics.mean_relative_ate(np.asarray(res.poses[b]),
                                        datas[b].gt)
        assert rel < 0.1, (b, rel)
