#!/usr/bin/env python
"""Production per-drone node — the swarm_localization_node binary equivalent.

Composes the full onboard stack from a YAML config: LocalProxy (UWB frames +
fixed-point broadcast), LoopNet over real UDP multicast, LoopDetector,
SwarmEstimator — and runs the reference's loop cadence: solve at
``force_freq``, predict at ``predict_freq``, comm scan continuously
(swarm_localization_node.cpp:182-192, swarm_loop.cpp:390-397).

Measurement input arrives on stdin as JSON lines (one sensor event each) so
any driver process can feed it:

    {"type": "vio",   "t": 1.0, "pose": [x, y, z, yaw], "vel": [vx, vy, vz]}
    {"type": "uwb",   "t": 1.0, "distances": {"1": 3.2, "2": 5.1}}
    {"type": "frame", "t": 1.0, "vio": {"0": [..4..]}, "ranges": [[0,1,3.2]]}

Outputs (fused states, predictions) stream to stdout as JSON lines.

    python tools/run_node.py --config configs/swarm5.yaml --drone-id 0
"""
from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--config", required=True)
    ap.add_argument("--drone-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=7667)
    ap.add_argument("--no-udp", action="store_true",
                    help="disable the multicast transport (solo replay)")
    args = ap.parse_args()

    from omniswarm_tpu.config import SwarmConfig
    from omniswarm_tpu.swarm.estimator import SwarmEstimator
    from omniswarm_tpu.swarm.proxy import FusedDownlink, LocalProxy
    from omniswarm_tpu.utils.diagnostics import install_crash_handler

    install_crash_handler()
    cfg = SwarmConfig.from_yaml(args.config)
    self_id = args.drone_id if args.drone_id is not None else cfg.self_id
    cfg.solver.self_id = self_id

    estimator = SwarmEstimator(cfg.solver, node_configs=cfg.nodes)
    downlink = FusedDownlink(self_id, send_freq=cfg.solver.predict_freq)

    node = None
    bus = None
    if not args.no_udp:
        try:
            from omniswarm_tpu.runtime.udp_transport import UdpMulticastBus
            from omniswarm_tpu.swarm.node import DroneNode

            bus = UdpMulticastBus(port=args.port)
            node = DroneNode(self_id, bus, solver_params=cfg.solver,
                             frontend_params=cfg.frontend,
                             node_configs=cfg.nodes,
                             global_dim=cfg.frontend.global_desc_dim)
            estimator = node.estimator
        except OSError as e:
            print(json.dumps({"warn": f"udp unavailable: {e}"}), flush=True)

    # Pipeline concurrency (reference: MultiThreadedSpinner + solver mutex,
    # swarm_localization_node.cpp:565, solver.hpp:55-56): the device solve
    # runs on a worker thread so ingestion and the high-rate predict path
    # keep flowing during a solve. The lock guards estimator mutation; the
    # jitted device program itself runs lock-free (estimator.execute_solve).
    import queue
    import threading

    est_lock = threading.RLock()
    solve_busy = threading.Event()
    results_q: "queue.Queue" = queue.Queue()

    def _solve_worker(t_req: float):
        try:
            with est_lock:
                prep = estimator.prepare_solve()
            if prep.get("refused"):
                results_q.put((t_req, prep["status"]))
                return
            res = estimator.execute_solve(prep)      # lock-free device call
            with est_lock:
                out = estimator.finalize_solve(prep, res)
            if node is not None:
                for pair, keys in estimator.pair_inliers.items():
                    from omniswarm_tpu.swarm.comm import InlierSetPacket
                    node.net.broadcast_inlier_set(
                        InlierSetPacket(drone_a=pair[0], drone_b=pair[1],
                                        loop_keys=sorted(keys)), t_req)
            results_q.put((t_req, out))
        except Exception as e:                       # pragma: no cover
            results_q.put((t_req, {"solved": False, "reason": repr(e)}))
        finally:
            solve_busy.clear()


    def _on_frame(sf):
        with est_lock:
            estimator.on_swarm_frame(
                sf.t, {d: p for d, (p, _v) in sf.nodes.items()}, sf.ranges)

    proxy = LocalProxy(self_id, on_frame=_on_frame)

    last_solve = -np.inf
    last_predict = -np.inf
    solve_period = 1.0 / max(cfg.solver.force_freq, 1e-3)
    predict_period = 1.0 / max(cfg.solver.predict_freq, 1e-3)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = float(msg.get("t", 0.0))
        kind = msg.get("type")
        if kind == "vio":
            pose = np.asarray(msg["pose"], float)
            with est_lock:
                proxy.on_self_odometry(t, pose, np.asarray(
                    msg.get("vel", [0, 0, 0]), float))
                estimator.on_vio(t, self_id, pose)
        elif kind == "uwb":
            with est_lock:
                proxy.on_uwb_tick(t, distances := {
                    int(k): float(v)
                    for k, v in msg.get("distances", {}).items()})
        elif kind == "frame":
            vio = {int(k): np.asarray(v, float)
                   for k, v in msg.get("vio", {}).items()}
            ranges = {(int(a), int(b)): float(v)
                      for a, b, v in msg.get("ranges", [])}
            with est_lock:
                estimator.on_swarm_frame(t, vio, ranges)
        elif kind == "det":
            # visual drone detection from an external detector process
            # (swarm_detector role); ingested locally AND framed for the
            # narrowband radio (send_node_detected parity)
            from omniswarm_tpu.swarm.estimator import DetRecord
            from omniswarm_tpu.swarm.proxy import NodeDetectedPacket

            direction = np.asarray(msg["direction"], float)
            inv_dep = float(msg.get("inv_dep", 0.0))
            with est_lock:
                estimator.on_detection(DetRecord(
                    t=t, drone_a=int(msg.get("source", self_id)),
                    drone_b=int(msg["target"]), direction=direction,
                    inv_dep=inv_dep,
                    enable_depth=bool(msg.get("enable_depth", True))))
            if inv_dep > 1e-6:
                pkt = proxy.broadcast_detection(NodeDetectedPacket(
                    t=t, source_id=self_id,
                    remote_drone_id=int(msg["target"]),
                    detection_id=int(msg.get("id", 0)),
                    rel_pos=direction / inv_dep,
                    rel_yaw=float(msg.get("rel_yaw", 0.0)),
                    pos_std=np.asarray(msg.get("pos_std", [0.1, 0.1, 0.1]),
                                       float),
                    yaw_std=float(msg.get("yaw_std", 0.1))))
                _ = pkt  # would go to the narrowband radio driver
        elif kind == "quit":
            break

        if bus is not None:
            bus.step(t)
        if node is not None:
            with est_lock:
                node.step(t)

        # drain completed async solves
        while not results_q.empty():
            t_req, out = results_q.get_nowait()
            print(json.dumps({"type": "solve", "t": t_req, **{
                k: (v if not isinstance(v, float) or np.isfinite(v) else None)
                for k, v in out.items()}}), flush=True)

        # dispatch a solve at force_freq; if the previous one is still in
        # flight, skip this tick (the reference's solve loop behaves the
        # same under its mutex, node.cpp:182-192)
        if t - last_solve >= solve_period and not solve_busy.is_set():
            last_solve = t
            solve_busy.set()
            threading.Thread(target=_solve_worker, args=(t,),
                             daemon=True).start()
        if t - last_predict >= predict_period and estimator.finish_init:
            last_predict = t
            with est_lock:
                pred = estimator.predict_swarm(t)
            print(json.dumps({
                "type": "predict", "t": t,
                "poses": {str(d): [round(float(x), 4) for x in p]
                          for d, p in pred.items()}}), flush=True)
            rel = {d: p for d, p in pred.items() if d != self_id}
            pkt = downlink.tick(t, rel)
            _ = pkt  # would go to the narrowband radio driver

    # wait for the in-flight solve and drain its result before exiting
    while solve_busy.is_set():
        time.sleep(0.01)
    while not results_q.empty():
        t_req, out = results_q.get_nowait()
        print(json.dumps({"type": "solve", "t": t_req, **{
            k: (v if not isinstance(v, float) or np.isfinite(v) else None)
            for k, v in out.items()}}), flush=True)
    # replay input can end before the async solve lands: emit the final
    # fused prediction once the last solve is in
    if estimator.finish_init:
        pred = estimator.predict_swarm(last_solve)
        if pred:
            print(json.dumps({
                "type": "predict", "t": last_solve,
                "poses": {str(d): [round(float(x), 4) for x in pp]
                          for d, pp in pred.items()}}), flush=True)

    if bus is not None:
        bus.close()


if __name__ == "__main__":
    main()
