"""ONLINE-path large-window benchmark -> ONLINE_1024.json (TPU artifact).

VERDICT r3 weak #1 / item 1: the kernel headline (2.1 ms/iter at F=1024)
must survive the production path. This drives the REAL online estimator —
ingestion, incremental grids, vectorized build, PCM, warm-started BT solve
— at a 1,024-keyframe 5-drone window with thousands of loops, on the real
chip, and records the host/device split plus end-to-end solve rate.

Usage: python tools/online_window_bench.py [--frames 1024] [--loops 2000]
       [--solves 12] [--out ONLINE_1024.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def ingest_tick(est, rng, pose, t, drones=5, n_loops=2):
    """One production tick: a new swarm frame + a couple of loop edges."""
    from omniswarm_tpu.sim.simulator import delta_pose_np
    from omniswarm_tpu.swarm.estimator import LoopRecord

    vio = {}
    for d in range(drones):
        yaw = pose[d][3]
        pose[d] = pose[d] + np.array(
            [0.1 * np.cos(yaw), 0.1 * np.sin(yaw),
             0.08 * np.cos(2 * np.pi * t / 60.0),
             0.05 + 0.002 * rng.normal()])
        vio[d] = pose[d] + rng.normal(0, 0.01, 4)
    ranges = {(a, b): float(np.linalg.norm(vio[a][:3] - vio[b][:3]))
              + rng.normal(0, 0.05)
              for a in range(drones) for b in range(a + 1, drones)}
    est.on_swarm_frame(t, vio, ranges)
    t0 = est.window[0].t
    for _ in range(n_loops):
        a, b = rng.choice(drones, 2, replace=False)
        ta = float(rng.uniform(t0 + 2, t - 1))
        tb = float(rng.uniform(t0 + 2, t - 1))
        pa = est._ego_pose_at(int(a), ta)
        pb = est._ego_pose_at(int(b), tb)
        if pa is None or pb is None:
            continue
        dp = delta_pose_np(pa, pb) + rng.normal(0, 0.01, 4)
        est.on_loop(LoopRecord(t_a=ta, drone_a=int(a), t_b=tb,
                               drone_b=int(b), dpose=dp,
                               pos_std=0.05, yaw_std=0.02))


def build_estimator(frames: int, loops: int, drones: int = 5):
    from omniswarm_tpu.config import SolverParams
    from omniswarm_tpu.sim.simulator import delta_pose_np
    from omniswarm_tpu.swarm.estimator import LoopRecord, SwarmEstimator

    # acpt_cost is an ABSOLUTE converged-cost gate tuned for the
    # reference's 100-frame windows (max_accept_cost); total cost grows
    # linearly with window size, so scale it or every big-window solve
    # would flip finish_init and re-run multi-init at F=1024
    p = SolverParams(self_id=0, max_frame_number=frames, kf_movement=0.05,
                     loop_outlier_distance_threshold=50.0,
                     acpt_cost=100.0 * max(frames / 25.0, 1.0),
                     max_iterations=50, publish_covariance=False)
    est = SwarmEstimator(p, rng_seed=0)
    rng = np.random.default_rng(0)
    pose = {d: np.array([0.0, 1.5 * d, 0, 0]) for d in range(drones)}
    for i in range(frames):
        vio = {}
        for d in range(drones):
            # gentle arc (2 m radius circles) so the x/y motion box
            # unlocks initialization like a real survey flight
            yaw = pose[d][3]
            pose[d] = pose[d] + np.array(
                [0.1 * np.cos(yaw), 0.1 * np.sin(yaw),
                 0.08 * np.cos(2 * np.pi * i / 60.0),
                 0.05 + 0.002 * rng.normal()])
            vio[d] = pose[d] + rng.normal(0, 0.01, 4)
        ranges = {(a, b): float(np.linalg.norm(vio[a][:3] - vio[b][:3]))
                  + rng.normal(0, 0.05)
                  for a in range(drones) for b in range(a + 1, drones)}
        est.on_swarm_frame(100.0 + i, vio, ranges)
        if i == 80 and not est.finish_init:
            # production-faithful init: the system initializes (multi-init
            # lanes) while the window is SMALL; by 1,024 keyframes every
            # solve is a warm single-init program. Solving multi-init at
            # F=1024 would compile a B=4 batched F=1024 solver no real
            # deployment ever runs.
            r = est.solve()
            assert r.get("solved"), r
    for k in range(loops):
        a, b = rng.choice(drones, 2, replace=False)
        ta = 100.0 + float(rng.integers(2, frames - 1))
        tb = 100.0 + float(rng.integers(2, frames - 1))
        pa = est._ego_pose_at(int(a), ta)
        pb = est._ego_pose_at(int(b), tb)
        dp = delta_pose_np(pa, pb) + rng.normal(0, 0.01, 4)
        est.on_loop(LoopRecord(t_a=ta, drone_a=int(a), t_b=tb,
                               drone_b=int(b), dpose=dp,
                               pos_std=0.05, yaw_std=0.02))
    return est, rng, pose


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--loops", type=int, default=2000)
    ap.add_argument("--solves", type=int, default=12)
    ap.add_argument("--out", default="ONLINE_1024.json")
    args = ap.parse_args()

    import jax

    print(f"[online-bench] backend={jax.default_backend()} "
          f"building {args.frames}-kf window ...", flush=True)
    t0 = time.perf_counter()
    est, rng, pose = build_estimator(args.frames, args.loops)
    print(f"[online-bench] ingest {time.perf_counter() - t0:.1f}s; "
          "first solve (compiles) ...", flush=True)

    t0 = time.perf_counter()
    r = est.solve()
    compile_s = time.perf_counter() - t0
    print(f"[online-bench] first solve {compile_s:.1f}s "
          f"cost={r.get('cost'):.4f} iters={r.get('iterations')}",
          flush=True)

    host_ms, device_ms, total_ms, iters = [], [], [], []
    t_now = 100.0 + args.frames
    for k in range(args.solves):
        # live operation between solves: a new keyframe (with eviction at
        # the full window) + fresh loop edges — the host build must absorb
        # deltas, not re-derive a static window
        t_now += 1.0
        ingest_tick(est, rng, pose, t_now)
        t0 = time.perf_counter()
        prep = est.prepare_solve()
        th = time.perf_counter()
        assert not prep.get("refused")
        assert prep["dense_graph"] is not None, "fast path fell back"
        res = est.execute_solve(prep)
        td = time.perf_counter()
        out = est.finalize_solve(prep, res)
        te = time.perf_counter()
        host_ms.append((th - t0) * 1e3)
        device_ms.append((td - th) * 1e3)
        total_ms.append((te - t0) * 1e3)
        iters.append(out["iterations"])
        print(f"[online-bench] solve {k}: host {host_ms[-1]:.1f} ms, "
              f"device {device_ms[-1]:.1f} ms ({iters[-1]} iters), "
              f"total {total_ms[-1]:.1f} ms", flush=True)

    med = lambda xs: float(np.median(xs))
    result = {
        "description": "ONLINE estimator at a 1,024-kf 5-drone window: "
                       "full production path (ingest grids, vectorized "
                       "build, PCM, warm BT solve) on the real chip",
        "backend": jax.default_backend(),
        "frames": args.frames,
        "loops_ingested": args.loops,
        "host_build_ms_median": med(host_ms),
        "device_solve_ms_median": med(device_ms),
        "end_to_end_ms_median": med(total_ms),
        "end_to_end_solves_per_s": 1e3 / med(total_ms),
        "iterations_median": med(iters),
        "device_ms_per_iter": med(device_ms) / max(med(iters), 1),
        "first_solve_compile_s": compile_s,
        "host_build_target_ms": 50.0,
        "host_build_met": med(host_ms) < 50.0,
        "one_hz_met": med(total_ms) < 1000.0,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
