#!/usr/bin/env python
"""Single-drone process for multi-process decentralized runs.

Each invocation runs ONE DroneNode end-to-end: loads the shared scenario
(sim data + visual world seed) from an .npz, feeds its own measurements,
exchanges keyframes/loops/PCM inliers with peer *processes* over real UDP
multicast (runtime/udp_multicast.cpp), solves, and writes its estimate to an
output .npz — the closest software analog of one drone's onboard stack.

    python tools/drone_process.py --scenario s.npz --drone-id 0 \
        --out out0.npz --port 17700
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("OMNISWARM_TPU") != "1":
    # Host-side orchestration runs on CPU by default — the environment may
    # preload a (slow, tunneled) TPU plugin via sitecustomize. Set
    # OMNISWARM_TPU=1 to let the solver use the accelerator.
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", required=True)
    ap.add_argument("--drone-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--port", type=int, default=17700)
    ap.add_argument("--step-wall", type=float, default=0.15,
                    help="wall seconds per sim frame (lets UDP flow)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omniswarm_tpu.config import FrontendParams, SolverParams
    from omniswarm_tpu.runtime.udp_transport import UdpMulticastBus
    from omniswarm_tpu.sim.visual_world import VisualWorld
    from omniswarm_tpu.swarm.node import DroneNode

    raw = np.load(args.scenario)
    gt = raw["gt"]             # (F, D, 4)
    vio = raw["vio"]
    ranges = raw["ranges"]
    range_valid = raw["range_valid"]
    times = raw["times"]
    world_seed = int(raw["world_seed"])
    F, D = gt.shape[:2]
    me = args.drone_id

    world = VisualWorld(seed=world_seed, n_landmarks=600, extent=8.0)
    bus = UdpMulticastBus(port=args.port)
    fp = FrontendParams(max_db_size=512, min_loop_matches=12,
                        match_index_dist=5, netvlad_thres=0.5,
                        pnp_iterations=128)
    node = DroneNode(me, bus,
                     solver_params=SolverParams(
                         pcm_redundant=False, max_iterations=60,
                         init_z_movement=0.05),
                     frontend_params=fp, global_dim=world.global_dim,
                     seed=me)

    for k in range(F):
        t = float(times[k])
        vio_k = {d: vio[k, d] for d in range(D)}
        ranges_k = {(a, b): float(ranges[k, a, b])
                    for a in range(D) for b in range(D)
                    if a != b and range_valid[k, a, b]}
        node.on_swarm_frame(t, vio_k, ranges_k)
        if k % 2 == 0:
            kf = world.make_keyframe(me, k, gt[k, me], t,
                                     vio_pose=vio[k, me])
            node.on_local_keyframe(kf, t)
        # let real datagrams propagate between processes
        deadline = time.time() + args.step_wall
        while time.time() < deadline:
            bus.step(t)
            node.step(t)
            time.sleep(0.01)

    out = node.solve(t=float(times[-1]))
    est = node.estimator
    kf_times = np.asarray([kf.t for kf in est.window])
    np.savez(args.out,
             solved=np.asarray(bool(out.get("solved"))),
             cost=np.asarray(out.get("cost", np.nan)),
             estimate=(est.estimate if est.estimate is not None
                       else np.zeros((0,))),
             window_ids=np.asarray(est.window_ids),
             kf_times=kf_times,
             loops_found=np.asarray(node.loops_found),
             loops_received=np.asarray(node.loops_received))
    bus.close()
    print(f"drone {me}: solved={out.get('solved')} "
          f"cost={out.get('cost', float('nan')):.2f} "
          f"loops found/recv={node.loops_found}/{node.loops_received}")


if __name__ == "__main__":
    main()
