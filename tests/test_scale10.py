"""10-drone swarm tier — the reference's simulator.launch drone_num cap.

The masked (F, D, 4) grid handles swarm size as a pure shape parameter;
m = 4D = 40 blocks are still MXU-friendly. (simulator.launch:4 runs up to
10+ drones against the real solver node.)
"""
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt


def test_ten_drone_window_converges():
    data = sim.generate(sim.SimParams(num_drones=10, num_frames=30, seed=4))
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    res = lm_solve_bt(graph, init, max_iterations=60)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) < float(res.initial_cost)
    rel = metrics.mean_relative_ate(np.asarray(res.poses), data.gt)
    rel_vio = metrics.mean_relative_ate(data.vio, data.gt)
    assert rel < rel_vio * 0.7, (rel, rel_vio)
    assert rel < 0.15, rel
