"""Benchmark: pose-graph LM solver throughput on the 5-drone benchmark graph.

Prints ONE JSON line. Primary metric (VERDICT r1 items 1/9 — honest
semantics): **per-problem** LM iterations/second of the production
block-tridiagonal + Woodbury solver (solver/dense.py::lm_solve_bt) on the
reference's headline configuration — 5 drones, 100-keyframe sliding window
(loop-5-drone.launch max_keyframe_num=100), UWB ranges at every frame,
ego-motion chains, loop closures, drone-to-drone detections. Aggregate
batch-8 throughput (the reference runs its multi-init trials serially,
solver.cpp:781-845; we run them in lock-step) is reported separately.

Baselines:
- measured (BASELINE_MEASURED.json, tools/cpu_baseline.py): best CPU
  implementation of the same problem on this host — numpy+SuperLU sparse LM
  (the Ceres SPARSE_NORMAL_CHOLESKY equivalent), numpy block-tridiagonal
  Thomas+Woodbury, and the repo's own solver XLA-compiled for CPU. All
  reach the same final cost as the TPU path.
- budget anchor: the reference's Ceres budget, <=1000 iterations in
  max_solver_time=0.5 s (loop-5-drone.launch:36-38, solver.cpp:1695-1706)
  = 2000 iter/s best-case on its hardware (never measured by the repo).

Scale-regime extras (VERDICT r1 item 2): 1024-keyframe single-chip window
solve, fleet-batch window throughput (parallel/swarm_batch.py), and the
visual front-end views/s (SuperPoint + NetVLAD at 400x208,
nodelet-sfisheye.launch:45-46).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BUDGET_ANCHOR_ITER_PER_S = 2000.0
BATCH = 8
ITERS = 100


def _median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import (
        dense_graph_from_sim,
        lm_solve_bt,
        lm_solve_bt_batched,
    )

    out = {}

    # ---- headline problem: 5 drones x 100 kf ---------------------------
    params = sim.SimParams(num_drones=5, num_frames=100, seed=0)
    data = sim.generate(params)
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)

    # per-problem (single instance) — the primary metric
    solve1 = lambda: lm_solve_bt(graph, init, max_iterations=ITERS,
                                 function_tolerance=0.0).poses
    res1 = lm_solve_bt(graph, init, max_iterations=ITERS,
                       function_tolerance=0.0)
    jax.block_until_ready(res1.poses)
    assert np.isfinite(float(res1.cost)), "solver diverged"
    assert float(res1.cost) < float(res1.initial_cost), "no cost decrease"
    iters1 = int(res1.iterations)
    dt1, _ = _median_time(solve1, reps=5)
    per_problem = iters1 / dt1

    # aggregate batch-8 lock-step (multi-init trials / fleet lanes)
    rng = np.random.default_rng(0)
    inits = np.tile(np.asarray(init)[None], (BATCH, 1, 1, 1))
    for b in range(1, BATCH):
        inits[b, :, 1:, :3] += rng.normal(
            0, 0.4, size=(100, 4, 3)).astype(np.float32)
    inits = jax.device_put(jnp.asarray(inits))
    solveB = lambda: lm_solve_bt_batched(
        graph, inits, max_iterations=ITERS, function_tolerance=0.0).poses
    resB = lm_solve_bt_batched(graph, inits, max_iterations=ITERS,
                               function_tolerance=0.0)
    jax.block_until_ready(resB.poses)
    costB = np.asarray(resB.cost)
    assert np.isfinite(costB).all(), "batched solver diverged"
    itersB = int(resB.iterations)
    dtB, _ = _median_time(solveB, reps=5)
    aggregate = itersB * BATCH / dtB

    # ---- measured CPU baseline ------------------------------------------
    cpu = {}
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            cpu = json.load(f)
    cpu_pp = float(cpu.get("best_cpu_iter_per_s", 0.0)) or None
    cpu_ag = float(cpu.get("best_cpu_aggregate_iter_per_s", 0.0)) or None

    # ---- scale regime ---------------------------------------------------
    extras = {}
    try:
        big = sim.generate(sim.SimParams(num_drones=5, num_frames=1024,
                                         seed=1, loop_every=128))
        gbig = jax.device_put(dense_graph_from_sim(big))
        ibig = jnp.asarray(big.vio, jnp.float32)
        BIG_ITERS = 25
        rbig = lm_solve_bt(gbig, ibig, max_iterations=BIG_ITERS,
                           function_tolerance=0.0)
        jax.block_until_ready(rbig.poses)
        assert np.isfinite(float(rbig.cost))
        dt_big, _ = _median_time(
            lambda: lm_solve_bt(gbig, ibig, max_iterations=BIG_ITERS,
                                function_tolerance=0.0).poses, reps=3)
        extras["kf1024_iter_per_s"] = round(int(rbig.iterations) / dt_big, 2)
        extras["kf1024_pose_updates_per_s"] = round(
            int(rbig.iterations) * 1024 * 5 / dt_big, 0)
    except Exception as e:                      # pragma: no cover
        extras["kf1024_error"] = str(e)[:200]

    try:
        from omniswarm_tpu.parallel.swarm_batch import solve_fleet

        FLEET = 8
        sims = [sim.generate(sim.SimParams(num_drones=5, num_frames=100,
                                           seed=100 + k))
                for k in range(FLEET)]
        # stacking needs one shared loop capacity; keep it tight — every
        # spare slot adds 4 Woodbury columns to every lane's SMW sweep
        cap = max(8, ((max(len(d.loops) for d in sims) + 15) // 16) * 16)
        graphs = [dense_graph_from_sim(d, max_loops=cap) for d in sims]
        finits = [jnp.asarray(d.vio, jnp.float32) for d in sims]
        rf = solve_fleet(graphs, finits, max_iterations=50,
                         function_tolerance=0.0)
        jax.block_until_ready(rf.poses)
        t0 = time.perf_counter()
        rf = solve_fleet(graphs, finits, max_iterations=50,
                         function_tolerance=0.0)
        jax.block_until_ready(rf.poses)
        dt_f = time.perf_counter() - t0
        # distinct 100-kf windows fully solved (50 LM iters) per second
        extras["fleet_windows_per_s"] = round(FLEET / dt_f, 2)
        extras["fleet_aggregate_iter_per_s"] = round(
            int(rf.iterations) * FLEET / dt_f, 2)
    except Exception as e:                      # pragma: no cover
        extras["fleet_error"] = str(e)[:200]

    try:
        from omniswarm_tpu.models.netvlad import GlobalDescriptorExtractor
        from omniswarm_tpu.models.superpoint import SuperPointExtractor

        H, W, B = 208, 400, 4
        imgs = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
            size=(B, H, W, 1)).astype(np.float32)))

        def frontend_rate(dtype):
            sp = SuperPointExtractor(height=H, width=W, max_keypoints=200,
                                     dtype=dtype)
            nv = GlobalDescriptorExtractor(height=H, width=W, out_dim=4096,
                                           dtype=dtype)
            o = sp(imgs)
            jax.block_until_ready(o[0])
            g = nv(imgs)
            jax.block_until_ready(g)
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                o = sp(imgs)
                g = nv(imgs)
            jax.block_until_ready(o[0])
            jax.block_until_ready(g)
            return B / ((time.perf_counter() - t0) / n)

        # bf16 conv trunks (MXU-native; heads stay f32 — parity pinned by
        # tests/test_bf16_frontend.py), f32 for reference
        extras["frontend_views_per_s"] = round(frontend_rate(jnp.bfloat16), 2)
        extras["frontend_dtype"] = "bfloat16"
        extras["frontend_views_per_s_f32"] = round(
            frontend_rate(jnp.float32), 2)
    except Exception as e:                      # pragma: no cover
        extras["frontend_error"] = str(e)[:200]

    out = {
        "metric": "pose_graph_lm_iter_per_s_5drone_100kf_per_problem",
        "value": round(per_problem, 2),
        "unit": "iter/s",
        # primary ratio: measured best-CPU per-problem baseline
        "vs_baseline": round(per_problem / cpu_pp, 3) if cpu_pp else None,
        "aggregate_iter_per_s_batch8": round(aggregate, 2),
        "vs_baseline_measured_per_problem":
            round(per_problem / cpu_pp, 3) if cpu_pp else None,
        "vs_baseline_measured_aggregate":
            round(aggregate / cpu_ag, 3) if cpu_ag else None,
        "vs_budget_anchor_aggregate":
            round(aggregate / BUDGET_ANCHOR_ITER_PER_S, 3),
        "cpu_baseline_per_problem_iter_per_s": cpu_pp,
        "cpu_baseline_aggregate_iter_per_s": cpu_ag,
        "cpu_baseline_host": f"{cpu.get('host', '?')}x{cpu.get('nproc', '?')}",
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
