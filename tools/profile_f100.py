#!/usr/bin/env python
"""F=100 production-window roofline experiment (VERDICT r4 item 4).

The reference-scale window (loop-5-drone.launch max 100 kf) ran at 72%
of HBM peak in r4 while F=1024 sits at 96% — the residual is the
per-level latency of thin (20, 20) blocks. r3 measured pack=4 neutral at
F<=256 WITHOUT the fused Pallas level; this re-measures the grid
{pack 1, 2, 4} x {fused on/off} on the single-instance AND batch-8
paths, median-of-5, on the real chip. Emits one JSON line.
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
    from omniswarm_tpu.solver.dense import (
        dense_graph_from_sim, lm_solve_bt, lm_solve_bt_batched)

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data = sim.generate(sim.SimParams(num_drones=5, num_frames=100, seed=0))
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    rng = np.random.default_rng(0)
    inits = np.tile(np.asarray(init)[None], (8, 1, 1, 1))
    for b in range(1, 8):
        inits[b, :, 1:, :3] += rng.normal(
            0, 0.4, size=(100, 4, 3)).astype(np.float32)
    initsB = jax.device_put(jnp.asarray(inits))

    init_np = np.asarray(data.vio, np.float32)
    _ctr = [0]                          # globally unique per (config, rep):
                                        # same rep contents across configs
                                        # hit the cache cross-executable

    def pert1(k):
        _ctr[0] += 1
        o = init_np.copy()
        o[0, 0, 0] += _ctr[0] * 1e-6 + np.random.uniform(0, 1e-6)
        return jax.device_put(jnp.asarray(o))

    def t_single(**kw):
        r = lm_solve_bt(graph, init, max_iterations=args.iters,
                        function_tolerance=0.0, **kw)
        jax.block_until_ready(r.poses)
        ts = []
        for k in range(5):
            ik = pert1(k)
            t0 = time.perf_counter()
            out = lm_solve_bt(graph, ik, max_iterations=args.iters,
                              function_tolerance=0.0, **kw)
            jax.block_until_ready(out.poses)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        return round(int(r.iterations) / dt, 1), float(r.cost)

    def pertB(k):
        _ctr[0] += 1
        o = np.array(inits, copy=True)
        o[0, 0, 0, 0] += _ctr[0] * 1e-6 + np.random.uniform(0, 1e-6)
        return jax.device_put(jnp.asarray(o))

    def t_batch(**kw):
        r = lm_solve_bt_batched(graph, initsB, max_iterations=args.iters,
                                function_tolerance=0.0, **kw)
        jax.block_until_ready(r.poses)
        ts = []
        for k in range(5):
            ik = pertB(k)
            t0 = time.perf_counter()
            out = lm_solve_bt_batched(
                graph, ik, max_iterations=args.iters,
                function_tolerance=0.0, **kw)
            jax.block_until_ready(out.poses)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        return round(int(r.iterations) * 8 / dt, 1)

    res = {}
    base_cost = None
    for pack in (1, 2, 4):
        for fused in (False, True):
            if fused and pack == 1:
                continue        # fused levels only help packed blocks
            key = f"single_pack{pack}" + ("_fused" if fused else "")
            rate, cost = t_single(pack=pack, fused=fused)
            if base_cost is None:
                base_cost = cost
            res[key] = {"iter_per_s": rate,
                        "cost_delta": round(
                            abs(cost - base_cost) / abs(base_cost), 7)}
            print(f"[f100] {key}: {res[key]}", flush=True)
    for pack in (1, 2, 4):
        key = f"batch8_pack{pack}"
        res[key] = {"aggregate_iter_per_s": t_batch(pack=pack)}
        print(f"[f100] {key}: {res[key]}", flush=True)
    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
