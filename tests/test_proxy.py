"""localization_proxy equivalent: fixed-point codec + frame merge queue."""
import numpy as np

from omniswarm_tpu.swarm.proxy import (
    INVALID_DISTANCE,
    LocalProxy,
    NodeRealtimeInfo,
    SwarmFrame,
    decode_realtime_info,
    encode_realtime_info,
)


def test_codec_roundtrip():
    info = NodeRealtimeInfo(
        t=12.345, drone_id=3, odometry_available=True,
        pos=np.array([1.5, -2.25, 0.75]),
        vel=np.array([0.12, -0.34, 0.05]),
        rpy=np.array([0.01, -0.02, 1.57]),
        distances={0: 3.21, 2: 0.5, 7: 12.0})
    out = decode_realtime_info(encode_realtime_info(info))
    assert out.drone_id == 3 and out.odometry_available
    np.testing.assert_allclose(out.t, 12.345, atol=1e-3)
    np.testing.assert_allclose(out.pos, info.pos, atol=1e-6)
    np.testing.assert_allclose(out.vel, info.vel, atol=0.01)   # cm/s
    np.testing.assert_allclose(out.rpy, info.rpy, atol=1e-3)   # mrad
    assert set(out.distances) == {0, 2, 7}
    np.testing.assert_allclose(out.distances[0], 3.21, atol=1e-3)


def test_frame_merge_queue():
    frames = []
    p0 = LocalProxy(0, queue_size=3, on_frame=frames.append)
    p1 = LocalProxy(1, queue_size=3)

    p0.on_self_odometry(0.0, np.array([0.0, 0, 1, 0]), np.zeros(3))
    p1.on_self_odometry(0.0, np.array([5.0, 0, 1, 0]), np.zeros(3))

    pkt1 = p1.on_uwb_tick(0.0, {0: 5.0})
    p0.on_uwb_tick(0.0, {1: 5.0})
    # remote packet arrives late but within the queue window → merged
    assert p0.on_remote_packet(pkt1)
    p0.flush()
    assert len(frames) == 1
    sf = frames[0]
    assert set(sf.nodes) == {0, 1}
    np.testing.assert_allclose(sf.nodes[1][0][:3], [5.0, 0, 1], atol=1e-5)
    assert sf.ranges[(0, 1)] == 5.0
    assert abs(sf.ranges[(1, 0)] - 5.0) < 1e-3


def test_queue_eviction_releases_frames():
    released = []
    p = LocalProxy(0, queue_size=2, on_frame=released.append)
    p.on_self_odometry(0.0, np.zeros(4), np.zeros(3))
    for k in range(5):
        p.on_uwb_tick(float(k), {})
    # queue holds 2; 3 frames released in order
    assert len(released) == 3
    assert [sf.t for sf in released] == [0.0, 1.0, 2.0]


def test_late_packet_outside_window_dropped():
    p = LocalProxy(0, queue_size=2)
    p.on_self_odometry(0.0, np.zeros(4), np.zeros(3))
    p.on_uwb_tick(10.0, {})
    info = NodeRealtimeInfo(
        t=0.0, drone_id=1, odometry_available=True, pos=np.zeros(3),
        vel=np.zeros(3), rpy=np.zeros(3), distances={})
    assert not p.on_remote_packet(encode_realtime_info(info))


def test_predict_frame_extrapolates():
    p = LocalProxy(0)
    p.on_self_odometry(1.0, np.array([1.0, 2.0, 3.0, 0.5]),
                       np.array([1.0, 0.0, -0.5]))
    sf = p.predict_frame(2.0)
    np.testing.assert_allclose(sf.nodes[0][0], [2.0, 2.0, 2.5, 0.5],
                               atol=1e-6)


def test_time_sync_linear_mapping():
    from omniswarm_tpu.swarm.proxy import TimeSync

    ts = TimeSync()
    # LPS clock runs at 1.0001x with 1000s offset + jitter
    rng = np.random.default_rng(0)
    for k in range(50):
        lps = k * 0.1
        host = 1000.0 + lps * 1.0001 + rng.normal(0, 1e-4)
        ts.add_reference(lps, host)
    assert abs(ts.lps_to_host(10.0) - (1000.0 + 10.0 * 1.0001)) < 1e-2
    assert abs(ts.host_to_lps(ts.lps_to_host(3.7)) - 3.7) < 1e-6


def test_time_sync_single_sample_offset():
    from omniswarm_tpu.swarm.proxy import TimeSync

    ts = TimeSync()
    ts.add_reference(5.0, 105.0)
    assert abs(ts.lps_to_host(6.0) - 106.0) < 1e-9


def test_fused_state_codec():
    from omniswarm_tpu.swarm.proxy import (
        FusedStatePacket,
        decode_fused_state,
        encode_fused_state,
    )

    p = FusedStatePacket(drone_id=3, ref_drone=0, t=42.125,
                         rel_pose=np.array([1.234, -5.678, 0.5, 0.789]))
    out = decode_fused_state(encode_fused_state(p))
    assert out.drone_id == 3 and out.ref_drone == 0
    np.testing.assert_allclose(out.t, 42.125, atol=1e-3)
    np.testing.assert_allclose(out.rel_pose, p.rel_pose, atol=1e-3)


def test_fused_downlink_round_robin():
    from omniswarm_tpu.swarm.proxy import FusedDownlink, decode_fused_state

    dl = FusedDownlink(0, send_freq=10.0)
    states = {1: np.zeros(4), 2: np.ones(4) * 0.1}
    sent = []
    t = 0.0
    for k in range(40):
        pkt = dl.tick(t, states)
        if pkt is not None:
            sent.append(decode_fused_state(pkt).drone_id)
        t += 0.025                     # 40 Hz ticks, 10 Hz budget
    # throttled to ~10 Hz over 1 s → ~10 packets, alternating drones
    assert 8 <= len(sent) <= 12, len(sent)
    assert set(sent) == {1, 2}


def test_node_detected_codec_roundtrip():
    """node_detected narrowband packet (localization_proxy.cpp:204-235)."""
    from omniswarm_tpu.swarm.proxy import (NodeDetectedPacket,
                                           decode_node_detected,
                                           encode_node_detected)

    p = NodeDetectedPacket(
        t=12.345, source_id=3, remote_drone_id=1002, detection_id=77,
        rel_pos=np.array([1.23, -4.56, 0.78]), rel_yaw=-0.514,
        pos_std=np.array([0.05, 0.05, 0.12]), yaw_std=0.03)
    buf = encode_node_detected(p)
    assert len(buf) == 27
    q = decode_node_detected(buf)
    assert q.source_id == 3 and q.remote_drone_id == 1002
    assert q.detection_id == 77
    assert abs(q.t - 12.345) < 1e-6
    np.testing.assert_allclose(q.rel_pos, p.rel_pos, atol=0.01)
    assert abs(q.rel_yaw - p.rel_yaw) < 1e-3
    np.testing.assert_allclose(q.pos_std, p.pos_std, atol=1e-3)
    assert abs(q.yaw_std - p.yaw_std) < 1e-3


def test_radio_framing_dispatch():
    """Framed narrowband channel carries all three packet families
    (the reference multiplexes MAVLink ids over UWB the same way)."""
    from omniswarm_tpu.swarm.proxy import (NodeDetectedPacket,
                                           FusedStatePacket, LocalProxy,
                                           encode_fused_state, frame_packet,
                                           PACKET_FUSED)

    got_det, got_fused, got_frames = [], [], []
    a = LocalProxy(0)
    b = LocalProxy(1, on_detection=got_det.append, on_fused=got_fused.append,
                   on_frame=got_frames.append)

    # realtime (odometry+ranges) round trip through the framed channel
    a.on_self_odometry(1.0, np.array([1.0, 2.0, 3.0, 0.2]),
                       np.array([0.1, 0, 0]))
    pkt = a.framed_uwb_tick(1.0, {1: 4.2})
    b.on_uwb_tick(1.0, {0: 4.2})
    assert b.on_radio_packet(pkt)           # merged into b's queue

    # visual detection relay
    det = NodeDetectedPacket(
        t=1.5, source_id=0, remote_drone_id=1001, detection_id=3,
        rel_pos=np.array([0.5, -0.2, 0.1]), rel_yaw=0.1,
        pos_std=np.array([0.05, 0.05, 0.1]), yaw_std=0.02)
    assert b.on_radio_packet(a.broadcast_detection(det))
    assert len(got_det) == 1 and got_det[0].remote_drone_id == 1001
    # own detections are not echoed back
    assert not a.on_radio_packet(a.broadcast_detection(det))

    # fused-state downlink
    fs = FusedStatePacket(drone_id=2, ref_drone=0, t=2.0,
                          rel_pose=np.array([1.0, 0, 0, 0.1]))
    assert b.on_radio_packet(frame_packet(PACKET_FUSED,
                                          encode_fused_state(fs)))
    assert len(got_fused) == 1 and got_fused[0].drone_id == 2
