#!/usr/bin/env python
"""Loop-dense serving solver: cg_iters sweep + warm-start measurement.

VERDICT r4 item 2: the F=1024 / ~2.5k-loop PCG configuration ran
39.1 ms/iter in ONLINE_1024 and was untracked. This measures, on the
real chip, ms/iter and FINAL COST for cg_iters in {24, 16, 12, 8} with
the r5 CG warm start (previous LM step seeds CG), against the exact
Woodbury path's cost as ground truth. Emits one JSON line.

    python tools/bench_dense_loops.py [--iters 25]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--loop-every", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data = sim.generate(sim.SimParams(num_drones=5, num_frames=args.frames,
                                      seed=4, loop_every=args.loop_every))
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    print(f"[dense-loops] F={args.frames} loops={len(data.loops)}",
          flush=True)

    init_np = np.asarray(data.vio, np.float32)

    def pert(k):
        o = init_np.copy()
        # content-distinct per rep AND per process (server cache)
        o[0, 0, 0] += (k + 1) * 1e-6 + np.random.uniform(0, 1e-6)
        return jnp.asarray(o)           # tunnel memoizes by input content

    def run(**kw):
        r = lm_solve_bt(graph, init, max_iterations=args.iters,
                        function_tolerance=0.0, **kw)
        jax.block_until_ready(r.poses)
        ts = []
        for k in range(3):
            ik = jax.device_put(pert(k))
            t0 = time.perf_counter()
            out = lm_solve_bt(graph, ik, max_iterations=args.iters,
                              function_tolerance=0.0, **kw)
            jax.block_until_ready(out.poses)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        return {"ms_per_iter": round(dt / int(r.iterations) * 1e3, 3),
                "iter_per_s": round(int(r.iterations) / dt, 2),
                "final_cost": float(r.cost)}

    res = {"frames": args.frames, "loops": len(data.loops)}
    for cg in (24, 16, 12, 8):
        res[f"pcg_cg{cg}"] = run(linear="pcg", cg_iters=cg)
        print(f"[dense-loops] cg_iters={cg}: {res[f'pcg_cg{cg}']}",
              flush=True)
    # exact-step reference cost (smw path; slow but exact)
    res["smw"] = run(linear="smw")
    print(f"[dense-loops] smw: {res['smw']}", flush=True)
    for cg in (24, 16, 12, 8):
        r = res[f"pcg_cg{cg}"]
        r["cost_vs_smw"] = round(
            (r["final_cost"] - res["smw"]["final_cost"])
            / max(abs(res["smw"]["final_cost"]), 1e-9), 5)
    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
