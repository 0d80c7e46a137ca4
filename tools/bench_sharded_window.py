#!/usr/bin/env python
"""Shape/scaling check: frame-sharded window LM on a virtual 8-device mesh.

The reference caps its sliding window at 100 keyframes because one CPU must
re-solve it every second (swarm_localization_solver.cpp:186-202). The
frame-sharded solver (parallel/sharded_window.py) removes that ceiling by
splitting the window across a device mesh. Real multi-chip hardware is not
available in this environment, so this harness times the sharded path on a
virtual N-device CPU mesh against the single-device CPU solve of the same
problem — a *shape and wiring* check (per-shard work really shrinks, the
SPIKE/psum couplings really run), NOT a performance claim: virtual devices
share the same host cores, so wall-clock parity (not speedup) is the
expected outcome here. On a real TPU pod the per-shard work is F/N of the
window with O(m^2 + m*C) bytes per iteration on ICI.

Prints one JSON line:

    python tools/bench_sharded_window.py [--frames 512] [--devices 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--drones", type=int, default=5)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    # sitecustomize may have imported jax with the axon TPU platform; force
    # CPU while the backend is still uninitialized (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from omniswarm_tpu import sim
    from omniswarm_tpu.parallel.sharded_window import lm_solve_bt_sharded
    from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt

    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) >= args.devices, devices
    mesh = Mesh(np.asarray(devices[:args.devices]), ("frames",))

    data = sim.generate(sim.SimParams(num_drones=args.drones,
                                      num_frames=args.frames, seed=3,
                                      loop_every=64))
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)

    def run_single():
        return lm_solve_bt(graph, init, max_iterations=args.iters,
                           function_tolerance=0.0)

    def run_sharded():
        return lm_solve_bt_sharded(graph, init, mesh,
                                   max_iterations=args.iters,
                                   function_tolerance=0.0)

    def timed(fn, reps=3):
        res = fn()
        jax.block_until_ready(res.poses)           # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            jax.block_until_ready(res.poses)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), res

    dt1, r1 = timed(run_single)
    dtN, rN = timed(run_sharded)

    # The sharded LM trajectory must match the production solver: identical
    # normal equations up to float summation order, whose rounding can
    # accumulate over the fixed iteration count — gate at 0.5% relative.
    cost_rel = abs(float(r1.cost) - float(rN.cost)) / max(float(r1.cost), 1.0)
    out = {
        "metric": "sharded_window_cpu_shape_check",
        "frames": args.frames,
        "drones": args.drones,
        "devices": args.devices,
        "host_cores": os.cpu_count(),
        "single_device_iter_per_s": round(int(r1.iterations) / dt1, 2),
        "sharded_iter_per_s": round(int(rN.iterations) / dtN, 2),
        "final_cost_rel_diff": cost_rel,
        "agree": cost_rel < 5e-3,
    }
    print(json.dumps(out))
    assert out["agree"], out


if __name__ == "__main__":
    main()
