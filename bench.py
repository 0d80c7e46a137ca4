"""Benchmark: pose-graph LM solver throughput on the 5-drone benchmark graph.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Problem: the reference's headline configuration — 5 drones, 100-keyframe
sliding window (loop-5-drone.launch max_keyframe_num=100), UWB ranges at
every frame, ego-motion chains, loop closures, drone-to-drone detections —
solved as a batch of 8 multi-init instances in lock-step (the reference runs
its init trials serially, solver.cpp:781-845) using the frame-dense assembly
+ cyclic-reduction block-tridiagonal linear solver with Woodbury loop
corrections (solver/dense.py::lm_solve_bt_batched — no dense Hessian is
ever materialized). Throughput = LM iterations x batch / wall time, 1 chip.

Baseline anchor: the reference's Ceres budget is <=1000 iterations in
max_solver_time=0.5 s (loop-5-drone.launch:36-38, solver.cpp:1695-1706),
i.e. 2000 iter/s best-case on its hardware. vs_baseline = our iter/s / 2000.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_ITER_PER_S = 2000.0
BATCH = 8
ITERS = 100


def main():
    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import (
        dense_graph_from_sim,
        lm_solve_bt_batched,
    )

    params = sim.SimParams(num_drones=5, num_frames=100, seed=0)
    data = sim.generate(params)
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    rng = np.random.default_rng(0)
    inits = np.tile(np.asarray(init)[None], (BATCH, 1, 1, 1))
    for b in range(1, BATCH):
        inits[b, :, 1:, :3] += rng.normal(
            0, 0.4, size=(100, 4, 3)).astype(np.float32)
    inits = jax.device_put(jnp.asarray(inits))

    solve = lambda: lm_solve_bt_batched(
        graph, inits, max_iterations=ITERS, function_tolerance=0.0)

    # Warmup / compile.
    res = solve()
    jax.block_until_ready(res.poses)
    cost = np.asarray(res.cost)
    assert np.isfinite(cost).all(), "solver diverged"
    assert float(cost[0]) < float(np.asarray(res.initial_cost)[0]), \
        "no cost decrease"

    n_rep = 5
    t0 = time.perf_counter()
    total_iters = 0
    for _ in range(n_rep):
        res = solve()
        jax.block_until_ready(res.poses)
        total_iters += int(res.iterations) * BATCH
    dt = time.perf_counter() - t0

    iter_per_s = total_iters / dt
    print(json.dumps({
        "metric": "pose_graph_lm_iter_per_s_5drone_100kf_batch8",
        "value": round(iter_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(iter_per_s / BASELINE_ITER_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
