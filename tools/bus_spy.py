#!/usr/bin/env python
"""Passive multicast traffic visualizer — the swarm_loop_spy equivalent.

Joins the swarm's UDP multicast group, decodes every packet, and prints
per-channel / per-drone message and byte rates
(/root/reference/swarm_loop/src/swarm_loop_spy.cpp listens on the LCM
channels the same way).

    python tools/bus_spy.py [--port 7667] [--interval 2.0]
"""
from __future__ import annotations

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7667)
    ap.add_argument("--interval", type=float, default=2.0)
    ap.add_argument("--duration", type=float, default=1e9)
    args = ap.parse_args()

    from omniswarm_tpu.runtime.udp_transport import _CHANNELS, UdpMulticastBus

    bus = UdpMulticastBus(port=args.port)
    counts = collections.Counter()
    senders = collections.Counter()

    def make_cb(channel):
        def cb(msg):
            counts[channel] += 1
            drone = getattr(msg, "drone_id", getattr(msg, "drone_a", "?"))
            senders[(channel, drone)] += 1
        return cb

    for ch in _CHANNELS:
        bus.subscribe(-1, ch, make_cb(ch))     # spy id -1 hears everyone

    t0 = time.time()
    last_print = t0
    try:
        while time.time() - t0 < args.duration:
            bus.step()
            now = time.time()
            if now - last_print >= args.interval:
                window = now - last_print
                lines = [f"--- {time.strftime('%H:%M:%S')} "
                         f"(last {window:.1f}s) ---"]
                for ch in _CHANNELS:
                    n = counts.pop(ch, 0)
                    if n:
                        lines.append(f"  {ch:22s} {n / window:7.1f} msg/s")
                per = collections.Counter()
                for (ch, drone), n in list(senders.items()):
                    per[drone] += n
                    del senders[(ch, drone)]
                for drone, n in sorted(per.items(), key=str):
                    lines.append(f"  drone {drone}: {n / window:7.1f} msg/s")
                print("\n".join(lines), flush=True)
                last_print = now
            time.sleep(0.02)
    except KeyboardInterrupt:
        pass
    bus.close()


if __name__ == "__main__":
    main()
