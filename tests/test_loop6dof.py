"""6-DoF loop-edge intake with attitude-aware re-anchoring (VERDICT r1 #5).

The reference's LoopEdge is a full 6-DoF relative pose; re-anchoring from
capture time to the nearest keyframes composes full-attitude VIO before
flattening to 4-DoF (swarm_localization_solver.cpp:1464-1553,
factors.hpp:226). A 4-DoF-only composition mis-rotates the camera-frame
translation whenever the platform is rolled/pitched at capture time.
"""
import numpy as np
import pytest

from omniswarm_tpu.core.geometry import (
    pose4_to_se3_np,
    quat_from_rpy_np,
    se3_delta_np,
    se3_inv_np,
    se3_mul_np,
    se3_to_pose4_np,
    yaw_from_quat_np,
)
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.swarm.estimator import LoopRecord, SwarmEstimator


def test_se3_helpers_roundtrip(rng):
    a = np.concatenate([rng.normal(size=3),
                        quat_from_rpy_np(0.3, -0.2, 0.7)])
    b = np.concatenate([rng.normal(size=3),
                        quat_from_rpy_np(-0.1, 0.15, -0.4)])
    ab = se3_mul_np(a, b)
    b2 = se3_mul_np(se3_inv_np(a), ab)
    np.testing.assert_allclose(b2, b, atol=1e-12)
    d = se3_delta_np(a, ab)
    np.testing.assert_allclose(d, b, atol=1e-12)
    # flatten consistency for a yaw-only pose
    p4 = np.array([1.0, -2.0, 0.5, 0.8])
    np.testing.assert_allclose(se3_to_pose4_np(pose4_to_se3_np(p4)), p4,
                               atol=1e-12)


def _tilted_scene():
    """Two drones, one loop captured mid-segment while drone A is tilted.

    Returns (estimator_4dof_loop, estimator_6dof_loop, gt_anchored_dpose).
    """
    roll, pitch = 0.35, -0.30       # aggressive attitude at capture time

    # drone A: keyframe at t=0 (level), capture at t=0.5 (tilted), kf t=1
    # drone B: static-ish, level
    pa_kf6 = np.concatenate([[0.0, 0.0, 1.0],
                             quat_from_rpy_np(0.0, 0.0, 0.1)])
    pa_cap6 = np.concatenate([[0.4, 0.1, 1.2],
                              quat_from_rpy_np(roll, pitch, 0.25)])
    pb_cap6 = np.concatenate([[2.0, 1.0, 1.0],
                              quat_from_rpy_np(0.0, 0.0, -0.3)])
    pb_kf6 = np.concatenate([[2.1, 1.05, 1.0],
                             quat_from_rpy_np(0.0, 0.0, -0.28)])

    # true 6-DoF loop measurement at capture time
    loop6 = se3_delta_np(pa_cap6, pb_cap6)
    # its naive 4-DoF flatten (what a 4-DoF-only pipeline would carry)
    loop4 = se3_to_pose4_np(loop6)

    # ground truth anchored edge between the KEYFRAMES (both level):
    gt6 = se3_delta_np(pa_kf6, pb_kf6)
    gt4 = se3_to_pose4_np(gt6)

    def build(use6):
        p = SolverParams(pcm_enable=False, det_dpos_thres=100.0,
                         loop_outlier_distance_threshold=100.0)
        est = SwarmEstimator(p)
        for t, d, p6 in ((0.0, 0, pa_kf6), (0.5, 0, pa_cap6),
                         (1.0, 0, pa_kf6), (0.0, 1, pb_kf6),
                         (0.5, 1, pb_cap6), (1.0, 1, pb_kf6)):
            est.on_vio(t, d, se3_to_pose4_np(p6), pose6=p6)
        # two keyframes bracketing the capture; anchor resolves to t=0.0
        est.window = []
        from omniswarm_tpu.swarm.estimator import KeyframeRecord
        est.window.append(KeyframeRecord(
            t=0.0, vio={0: se3_to_pose4_np(pa_kf6),
                        1: se3_to_pose4_np(pb_kf6)}))
        est._window_gen += 1
        est.on_loop(LoopRecord(
            t_a=0.5, drone_a=0, t_b=0.5, drone_b=1,
            dpose=loop4, pos_std=0.05, yaw_std=0.02,
            dpose6=loop6 if use6 else None))
        anchored = est._filter_loops({0: 0, 1: 1})
        assert len(anchored) == 1
        return np.asarray(anchored[0][4])

    return build(False), build(True), gt4


def test_6dof_reanchoring_removes_attitude_bias():
    dpose4_only, dpose6, gt = _tilted_scene()
    err4 = np.linalg.norm(dpose4_only[:3] - gt[:3])
    err6 = np.linalg.norm(dpose6[:3] - gt[:3])
    # the 4-DoF-only path carries a real attitude-induced bias; the 6-DoF
    # path removes it (up to flattening the final level-keyframe edge)
    assert err4 > 0.05, f"scene not discriminative (err4={err4:.3f})"
    assert err6 < 0.02, f"6-DoF path biased: {err6:.3f}"
    assert err6 < err4 * 0.25


def test_6dof_loop_survives_packet_roundtrip():
    """dpose6 travels through the LoopNet bus to peer estimators."""
    from omniswarm_tpu.swarm.comm import LoopEdgePacket
    from omniswarm_tpu.swarm.node import DroneNode
    from omniswarm_tpu.swarm.comm import LossyBus

    bus = LossyBus(seed=0)
    n0 = DroneNode(0, bus, global_dim=16)
    n1 = DroneNode(1, bus, global_dim=16)
    loop6 = np.concatenate([[1.0, 0.5, -0.2],
                            quat_from_rpy_np(0.1, -0.05, 0.3)])
    pkt = LoopEdgePacket(
        drone_a=0, t_a=1.0, drone_b=1, t_b=1.0,
        dpose=se3_to_pose4_np(loop6), pos_std=0.05, yaw_std=0.02,
        dpose6=loop6)
    n0.net.broadcast_loop_edge(pkt, 1.0)
    bus.step(1.1)
    n0.step(1.1)
    n1.step(1.1)
    assert len(n1.estimator.loops) == 1
    got = n1.estimator.loops[0]
    assert got.dpose6 is not None
    np.testing.assert_allclose(got.dpose6, loop6, atol=1e-6)
