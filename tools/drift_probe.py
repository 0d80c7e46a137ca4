#!/usr/bin/env python
"""Headline-drift bisect probe (VERDICT r4 weak #1).

Runs ONE version's headline measurement (5-drone/100-kf per-problem LM
iter/s, median of 5 full solves) against the code tree given as argv[1],
so r2/r3/r4/HEAD worktrees can be probed back-to-back in one session —
same chip, same hour — to separate tunnel noise from a real regression.

    python tools/drift_probe.py /tmp/wt_r2
"""
import json
import sys
import time

sys.path.insert(0, sys.argv[1])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt

    params = sim.SimParams(num_drones=5, num_frames=100, seed=0)
    data = sim.generate(params)
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    r = lm_solve_bt(graph, init, max_iterations=100, function_tolerance=0.0)
    jax.block_until_ready(r.poses)
    iters = int(r.iterations)
    init_np = np.asarray(data.vio, np.float32)
    ts = []
    for k in range(5):
        o = init_np.copy()
        o[0, 0, 0] += (k + 1) * 1e-6 + np.random.uniform(0, 1e-6)
        ik = jax.device_put(jnp.asarray(o))
        t0 = time.perf_counter()
        out = lm_solve_bt(graph, ik, max_iterations=100,
                          function_tolerance=0.0)
        jax.block_until_ready(out.poses)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(json.dumps({
        "tree": sys.argv[1], "iters": iters,
        "per_problem_iter_per_s": round(iters / dt, 2),
        "all_runs": [round(iters / t, 1) for t in ts],
        "cost": float(r.cost)}), flush=True)


if __name__ == "__main__":
    main()
