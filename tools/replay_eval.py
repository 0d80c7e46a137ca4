#!/usr/bin/env python
"""Dataset replay evaluation — the loop-5-drone bag_replay:=true analog.

Replays real flight logs (or a Recording .npz) through the full online
SwarmEstimator at keyframe rate and writes the accuracy report, exactly the
reference's bag-replay + local_plot evaluation loop
(README.md:53-60, scripts/local_plot.py).

    python tools/replay_eval.py --logs a.csv:530 b.csv:20 --frames 40 \
        --out replay_out
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if os.environ.get("OMNISWARM_TPU") != "1":
    # Host-side orchestration runs on CPU by default — the environment may
    # preload a (slow, tunneled) TPU plugin via sitecustomize. Set
    # OMNISWARM_TPU=1 to let the solver use the accelerator.
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from omniswarm_tpu.config import SolverParams
    from omniswarm_tpu.eval import metrics
    from omniswarm_tpu.eval.report import write_report
    from omniswarm_tpu.io import replay_dataset
    from omniswarm_tpu.swarm import SwarmEstimator

    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", nargs="+", required=True,
                    help="path:toffset per drone")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--out", default="replay_out")
    ap.add_argument("--solve-every", type=int, default=10)
    # real circle flights are small-scale; PC-replay launch configs relax
    # the init-motion gates (loop-5-pc.launch role)
    ap.add_argument("--init-xy", type=float, default=0.3)
    ap.add_argument("--init-z", type=float, default=0.02)
    ap.add_argument("--kf-movement", type=float, default=0.2,
                    help="keyframe admission threshold (small for slow "
                         "real circle flights)")
    ap.add_argument("--loops", action="store_true",
                    help="synthesize loop closures over the real "
                         "trajectories (simulator-tier place recognition)")
    args = ap.parse_args()

    logs = []
    for spec in args.logs:
        path, _, off = spec.rpartition(":")
        logs.append((path, float(off)))
    data = replay_dataset(logs, num_frames=args.frames, dt=args.dt,
                          synth_loops=args.loops)
    D = data.gt.shape[1]

    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True,
                                      init_xy_movement=args.init_xy,
                                      init_z_movement=args.init_z,
                                      kf_movement=args.kf_movement))
    from omniswarm_tpu.swarm.estimator import LoopRecord

    loops_by_frame = {}
    for lp in data.loops:
        loops_by_frame.setdefault(lp.frame_a, []).append(lp)
    for k in range(args.frames):
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in range(D) for b in range(D)
                  if a != b and data.range_valid[k, a, b]}
        est.on_swarm_frame(float(data.times[k]), vio, ranges)
        for lp in loops_by_frame.get(k, ()):
            est.on_loop(LoopRecord(
                t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
                t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
                dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
        if (k + 1) % args.solve_every == 0:
            out = est.solve()
            print(f"t={data.times[k]:6.1f}s solve: {out}")

    out = est.solve()
    if not out.get("solved") or est.estimate is None:
        print(f"final solve failed: {out}")
        return
    kf_idx = [int(round(kf.t / args.dt)) for kf in est.window]
    gt = data.gt[kf_idx]
    rel = metrics.mean_relative_ate(est.estimate, gt)
    write_report(args.out, est.estimate, gt,
                 times=np.asarray(kf_idx, float) * args.dt,
                 vio=data.vio[kf_idx])
    print(f"relative ATE {rel * 100:.1f} cm "
          f"(raw VIO {metrics.mean_relative_ate(data.vio[kf_idx], gt) * 100:.1f} cm)"
          f" → {args.out}/summary.json")


if __name__ == "__main__":
    main()
