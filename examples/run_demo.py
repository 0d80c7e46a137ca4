#!/usr/bin/env python
"""End-to-end demo: decentralized 3-drone swarm, full pipeline, report.

Runs the complete stack in-process: simulated trajectories + UWB, synthetic
visual world → per-drone DroneNodes (keyframes → loop detection → multicast
exchange → PCM → sliding-window solve) over a lossy bus, then writes an
accuracy report (figures + JSON) per drone under ./demo_out/.

    python examples/run_demo.py [--drones 3] [--frames 30] [--drop 0.05]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from omniswarm_tpu import sim
from omniswarm_tpu.config import FrontendParams, SolverParams
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.eval.report import write_report
from omniswarm_tpu.sim.visual_world import VisualWorld
from omniswarm_tpu.swarm.comm import LossyBus
from omniswarm_tpu.swarm.node import DroneNode
from omniswarm_tpu.utils.telemetry import GLOBAL as telemetry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drones", type=int, default=3)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--drop", type=float, default=0.05)
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args()

    D, F = args.drones, args.frames
    print(f"simulating {D} drones x {F} keyframes ...")
    data = sim.generate(sim.SimParams(
        num_drones=D, num_frames=F, seed=7,
        radius_range=(2.0, 4.0), z_range=(0.8, 2.0)))
    world = VisualWorld(seed=7, n_landmarks=800, extent=8.0)
    bus = LossyBus(drop_rate=args.drop, seed=3)
    fp = FrontendParams(max_db_size=1024, min_loop_matches=12,
                        match_index_dist=5, netvlad_thres=0.5,
                        pnp_iterations=128)
    nodes = [DroneNode(d, bus,
                       solver_params=SolverParams(
                           pcm_redundant=False, max_iterations=60,
                           init_z_movement=0.05),
                       frontend_params=fp, global_dim=world.global_dim,
                       seed=d)
             for d in range(D)]

    for k in range(F):
        t = float(data.times[k])
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in range(D) for b in range(D)
                  if a != b and data.range_valid[k, a, b]}
        for node in nodes:
            node.on_swarm_frame(t, vio, ranges)
        if k % 2 == 0:
            for d, node in enumerate(nodes):
                kf = world.make_keyframe(d, k, data.gt[k, d], t,
                                         vio_pose=data.vio[k, d])
                node.on_local_keyframe(kf, t)
        bus.step(t + 0.01)
        for node in nodes:
            node.step(t + 0.02)

    print(f"loops found: {sum(n.loops_found for n in nodes)}, "
          f"received: {sum(n.loops_received for n in nodes)}")

    for node in nodes:
        out = node.solve(t=float(data.times[-1]))
        est = node.estimator
        if not out.get("solved") or est.estimate is None:
            print(f"drone {node.drone_id}: NOT SOLVED ({out})")
            continue
        kf_idx = [int(round(kf.t)) for kf in est.window]
        gt = data.gt[kf_idx]
        vio = data.vio[kf_idx]
        rel = metrics.mean_relative_ate(est.estimate, gt)
        rel_vio = metrics.mean_relative_ate(vio, gt)
        out_dir = os.path.join(args.out, f"drone{node.drone_id}")
        write_report(out_dir, est.estimate, gt,
                     times=np.asarray(kf_idx, float), vio=vio)
        print(f"drone {node.drone_id}: cost={out['cost']:.1f} "
              f"relative ATE {rel * 100:.1f} cm (raw VIO: "
              f"{rel_vio * 100:.1f} cm) → {out_dir}/")

    print("\ntelemetry:")
    print(telemetry.summary())


if __name__ == "__main__":
    main()
