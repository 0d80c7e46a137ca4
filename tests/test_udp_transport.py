"""Native UDP multicast transport over loopback (skips if sockets blocked)."""
import time

import numpy as np
import pytest

from omniswarm_tpu.swarm.comm import LoopEdgePacket, LoopNet


def make_bus():
    from omniswarm_tpu.runtime.udp_transport import UdpMulticastBus

    try:
        return UdpMulticastBus(port=17667)
    except (OSError, RuntimeError) as e:
        pytest.skip(f"multicast unavailable in sandbox: {e}")


def test_udp_loop_edge_roundtrip():
    bus = make_bus()
    edges = []
    net1 = LoopNet(bus, 1)
    LoopNet(bus, 2, on_loop=edges.append)
    pkt = LoopEdgePacket(drone_a=1, t_a=0.5, drone_b=2, t_b=1.5,
                         dpose=np.arange(4.0), pos_std=0.05, yaw_std=0.02)
    net1.broadcast_loop_edge(pkt, 0.0)
    deadline = time.time() + 2.0
    while time.time() < deadline and not edges:
        bus.step()
        time.sleep(0.01)
    bus.close()
    assert edges, "datagram not delivered over loopback multicast"
    got = edges[0]
    assert got.drone_a == 1 and got.drone_b == 2
    np.testing.assert_allclose(got.dpose, np.arange(4.0))


def test_udp_keyframe_roundtrip():
    import sys
    sys.path.insert(0, "tests")
    from test_comm import make_kf

    bus = make_bus()
    received = []
    net1 = LoopNet(bus, 1)
    net2 = LoopNet(bus, 2, on_keyframe=received.append)
    net1.broadcast_keyframe(make_kf(drone=1, frame=9, K=30), 0.0)
    deadline = time.time() + 2.0
    while time.time() < deadline:
        bus.step()
        net2.scan_recv_packets(time.time())
        if received:
            break
        time.sleep(0.01)
    bus.close()
    assert received and received[0].frame_id == 9
    assert received[0].valid.sum() == 30
