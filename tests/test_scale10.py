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


def test_ten_drone_large_window_packs_to_80_wide():
    """F>=384 at D=10 packs 2 frames/block (80-wide), not 4 (160-wide —
    measured slower); solve agrees with the unpacked path."""
    from omniswarm_tpu.solver.dense import _auto_pack

    assert _auto_pack(512, 40) == 2
    assert _auto_pack(512, 20) == 4
    assert _auto_pack(512, 80) == 1
    # r5: mid windows (96<=F<384) pack 2 at m<=20 (+2-3% measured at
    # F=100, F100_GRID_r05.json); tiny windows stay unpacked
    assert _auto_pack(100, 20) == 2
    assert _auto_pack(100, 40) == 1
    assert _auto_pack(64, 20) == 1

    # The two D=10 solves run in a FRESH interpreter: late in a full
    # suite (hundreds of accumulated XLA-CPU executables) this exact
    # compile SEGFAULTS the process (rc=139, reproduced 5x at this test;
    # passes in isolation every time) — an XLA-CPU backend fragility,
    # not a solver property. Subprocess isolation keeps the coverage
    # and makes the crash impossible to trigger.
    import subprocess
    import sys as _sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from omniswarm_tpu import sim
from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt
data = sim.generate(sim.SimParams(num_drones=10, num_frames=48, seed=6))
graph = dense_graph_from_sim(data)
init = jnp.asarray(data.vio, jnp.float32)
r1 = lm_solve_bt(graph, init, max_iterations=20, pack=1)
r2 = lm_solve_bt(graph, init, max_iterations=20, pack=2)
print("COSTS", float(r1.cost), float(r2.cost))
"""
    out = subprocess.run([_sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("COSTS")][0]
    c1, c2 = (float(x) for x in line.split()[1:])
    assert np.isfinite(c1) and np.isfinite(c2)
    assert abs(c1 - c2) / max(c1, 1e-9) < 5e-3, (c1, c2)
