"""Window-scaling sweep F=1k..16k -> WINDOW_SCALE_r04.json (TPU).

VERDICT r3 item 7: extend the sweep past 4,096 keyframes and hold
>=2M pose-updates/s (the r3 sweep showed a droop at 4k: 2.68M/s at 2k ->
2.25M/s). Same methodology as bench.py's kf1024 row: lm_solve_bt with a
fixed iteration budget, loop density ~F/128, median of 3 timed runs.

Usage: python tools/window_scale_sweep.py [--frames 1024,2048,4096,8192]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default="1024,2048,4096,8192,16384")
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--out", default="WINDOW_SCALE_r04.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt

    rows = []
    for F in [int(x) for x in args.frames.split(",")]:
        print(f"[sweep] F={F}: generating ...", flush=True)
        data = sim.generate(sim.SimParams(num_drones=5, num_frames=F,
                                          seed=1, loop_every=128))
        graph = jax.device_put(dense_graph_from_sim(data))
        init = jnp.asarray(data.vio, jnp.float32)
        t0 = time.perf_counter()
        r = lm_solve_bt(graph, init, max_iterations=args.iters,
                        function_tolerance=0.0)
        jax.block_until_ready(r.poses)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(float(r.cost)), (F, float(r.cost))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = lm_solve_bt(graph, init, max_iterations=args.iters,
                              function_tolerance=0.0)
            jax.block_until_ready(out.poses)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        it = int(r.iterations)
        row = {
            "frames": F,
            "loops": int(np.asarray(graph.loops.valid).sum()),
            "ms_per_iter": round(dt / it * 1e3, 3),
            "iter_per_s": round(it / dt, 1),
            "pose_updates_per_s": round(it * F * 5 / dt, 0),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(f"[sweep] F={F}: {row['ms_per_iter']} ms/iter, "
              f"{row['pose_updates_per_s'] / 1e6:.2f}M pose-updates/s "
              f"(compile {row['compile_s']}s)", flush=True)

    result = {
        "description": "Single-chip BT-LM window scaling (v5e, "
                       "loop density F/128, 25-iteration solves, "
                       "median of 3)",
        "target_pose_updates_per_s": 2e6,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
