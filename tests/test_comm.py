"""LoopNet transport: packetization, reassembly, loss tolerance, rates."""
import numpy as np
import pytest

from omniswarm_tpu.swarm.comm import (
    CHANNEL_VIOKF_LANDMARKS,
    KeyframeData,
    LoopEdgePacket,
    LossyBus,
    LoopNet,
)


def make_kf(drone=1, frame=0, K=20, seed=0):
    rng = np.random.default_rng(seed)
    desc = rng.normal(size=(K, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return KeyframeData(
        drone_id=drone, frame_id=frame, t=float(frame),
        pose=np.zeros(4, np.float32),
        global_desc=rng.normal(size=256).astype(np.float32),
        kp_xy=rng.uniform(0, 100, size=(K, 2)).astype(np.float32),
        landmarks_3d=rng.normal(size=(K, 3)).astype(np.float32),
        local_desc=desc, valid=np.ones(K, bool))


def test_lossless_roundtrip():
    bus = LossyBus()
    received = []
    net1 = LoopNet(bus, 1)
    net2 = LoopNet(bus, 2, on_keyframe=received.append)
    kf = make_kf(drone=1, frame=3)
    net1.broadcast_keyframe(kf, t=0.0)
    bus.step(0.0)
    net2.scan_recv_packets(0.1)
    assert len(received) == 1
    out = received[0]
    assert out.drone_id == 1 and out.frame_id == 3
    assert out.valid.sum() == 20
    np.testing.assert_allclose(out.landmarks_3d, kf.landmarks_3d, atol=1e-6)
    # int8-quantized descriptors still near-unit and close
    sims = np.sum(out.local_desc * kf.local_desc, axis=1)
    assert sims.min() > 0.99


def test_sender_dedup():
    bus = LossyBus()
    net1 = LoopNet(bus, 1)
    LoopNet(bus, 2)
    kf = make_kf()
    net1.broadcast_keyframe(kf, 0.0)
    n1 = bus.bytes_sent[CHANNEL_VIOKF_LANDMARKS]
    net1.broadcast_keyframe(kf, 0.5)     # same (drone, frame) → suppressed
    assert bus.bytes_sent[CHANNEL_VIOKF_LANDMARKS] == n1


def test_lossy_partial_delivery():
    # seed chosen so the header packet survives the 40% loss (a dropped
    # header kills the whole keyframe, as in the reference)
    bus = LossyBus(drop_rate=0.4, seed=4)
    received = []
    net1 = LoopNet(bus, 1, recv_period=0.5)
    net2 = LoopNet(bus, 2, recv_period=0.5, on_keyframe=received.append)
    kf = make_kf(K=50)
    net1.broadcast_keyframe(kf, 0.0)
    bus.step(0.0)
    net2.scan_recv_packets(0.1)          # not yet finalized (incomplete)
    net2.scan_recv_packets(1.0)          # timeout → partial keyframe out
    assert len(received) == 1
    got = received[0].valid.sum()
    assert 10 <= got < 50                # some landmarks lost, some arrived
    rate = net2.receive_rate(1)
    assert 0.3 < rate < 1.0


def test_latency_delivery_order():
    bus = LossyBus(latency=0.2)
    received = []
    net1 = LoopNet(bus, 1)
    net2 = LoopNet(bus, 2, on_keyframe=received.append)
    net1.broadcast_keyframe(make_kf(), 0.0)
    bus.step(0.1)                        # too early
    net2.scan_recv_packets(0.1)
    assert not received
    bus.step(0.3)
    net2.scan_recv_packets(0.9)
    assert len(received) == 1


def test_loop_edge_broadcast():
    bus = LossyBus()
    edges = []
    net1 = LoopNet(bus, 1)
    LoopNet(bus, 2, on_loop=edges.append)
    pkt = LoopEdgePacket(drone_a=1, t_a=0.0, drone_b=2, t_b=1.0,
                         dpose=np.zeros(4), pos_std=0.05, yaw_std=0.02)
    net1.broadcast_loop_edge(pkt, 0.0)
    bus.step(0.0)
    assert len(edges) == 1 and edges[0].drone_b == 2


def test_blacklist():
    bus = LossyBus()
    received = []
    net1 = LoopNet(bus, 1)
    net2 = LoopNet(bus, 2, on_keyframe=received.append)
    net2.blacklist.add(1)
    net1.broadcast_keyframe(make_kf(), 0.0)
    bus.step(0.0)
    net2.scan_recv_packets(1.0)
    assert not received


def test_whole_img_desc_mode():
    """send_whole_img_desc: one packet, no header/landmark split
    (loop_net.cpp:103-120)."""
    bus = LossyBus()
    received = []
    net1 = LoopNet(bus, 1, send_whole_img_desc=True)
    LoopNet(bus, 2, on_keyframe=received.append)
    kf = make_kf(drone=1, frame=7)
    net1.broadcast_keyframe(kf, t=0.0)
    assert bus.bytes_sent.get(CHANNEL_VIOKF_LANDMARKS, 0) == 0
    bus.step(0.0)
    # Delivered immediately — no reassembly scan needed.
    assert len(received) == 1
    out = received[0]
    assert out.frame_id == 7
    np.testing.assert_allclose(out.local_desc, kf.local_desc)
    np.testing.assert_allclose(out.landmarks_3d, kf.landmarks_3d)


def test_send_img_jpeg_roundtrip():
    """send_img attaches a JPEG-encoded image (loop_cam.cpp:56-71)."""
    from omniswarm_tpu.swarm.comm import decode_image, encode_image

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, size=(48, 64)).astype(np.float32)
    # smooth it so JPEG survives at q50
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0

    data = encode_image(img, quality=90)
    back = decode_image(data)
    assert back.shape == img.shape
    assert np.abs(back - img).mean() < 0.08

    bus = LossyBus()
    received = []
    net1 = LoopNet(bus, 1, send_img=True, jpg_quality=90)
    LoopNet(bus, 2, on_keyframe=received.append)
    kf = make_kf(drone=1, frame=2)
    kf.image = img
    net1.broadcast_keyframe(kf, t=0.0)
    bus.step(0.0)
    assert len(received) == 1
    assert received[0].image is not None
    assert received[0].image.shape == img.shape
