#!/usr/bin/env python
"""Swarm network tester — the loop_network_tester equivalent.

Broadcasts dummy 200-landmark keyframes at a fixed rate over the real UDP
multicast transport and reports per-drone packet receive rates
(/root/reference/swarm_loop/src/loop_network_tester.cpp:71 publishes the
same statistics as drone_network_status messages).

    python tools/network_tester.py --drone-id 0 --peers 1,2 --rate 1.0
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from omniswarm_tpu.runtime.udp_transport import UdpMulticastBus
from omniswarm_tpu.swarm.comm import KeyframeData, LoopNet


def dummy_keyframe(drone_id: int, frame_id: int, n_landmarks: int = 200):
    rng = np.random.default_rng(frame_id)
    desc = rng.normal(size=(n_landmarks, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return KeyframeData(
        drone_id=drone_id, frame_id=frame_id, t=time.time(),
        pose=np.zeros(4, np.float32),
        global_desc=rng.normal(size=4096).astype(np.float32),
        kp_xy=rng.uniform(0, 400, size=(n_landmarks, 2)).astype(np.float32),
        landmarks_3d=rng.normal(size=(n_landmarks, 3)).astype(np.float32),
        local_desc=desc, valid=np.ones(n_landmarks, bool))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drone-id", type=int, required=True)
    ap.add_argument("--rate", type=float, default=1.0, help="keyframes/s")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--port", type=int, default=7667)
    args = ap.parse_args()

    bus = UdpMulticastBus(port=args.port)
    received = []
    net = LoopNet(bus, args.drone_id, on_keyframe=received.append)

    t0 = time.time()
    frame = 0
    next_send = t0
    while time.time() - t0 < args.duration:
        now = time.time()
        if now >= next_send:
            net.broadcast_keyframe(dummy_keyframe(args.drone_id, frame), now)
            frame += 1
            next_send += 1.0 / args.rate
        bus.step(now)
        net.scan_recv_packets(now)
        time.sleep(0.01)

    print(f"sent {frame} keyframes; received {len(received)} from peers")
    for drone in sorted(net.recv_expected):
        print(f"  drone {drone}: receive rate "
              f"{net.receive_rate(drone) * 100:.1f}% "
              f"({net.recv_packets.get(drone, 0)} packets)")
    bus.close()


if __name__ == "__main__":
    main()
