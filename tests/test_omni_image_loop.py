"""Omnidirectional & fisheye image-level loop closure.

Extends tests/test_image_loop.py to the reference's primary configuration:
multi-direction keyframes (FisheyeFrameDescriptor_t, loop_cam.cpp:178-229)
and fisheye optics (camodocal MEI models). A drone seeing the wall in its
FRONT view must close a loop against a revisit that sees the same wall in a
SIDE view (the body yawed 90 deg) — the bearing-space merge replaces the
reference's direction-aligned correspondence rotation — and a MEI camera
with real distortion must still triangulate and close loops through the
distortion-aware lift.
"""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.ops.camera import CameraBearings, MeiCamera
from omniswarm_tpu.sim.image_world import WallWorld, _rotz
from omniswarm_tpu.sim.simulator import delta_pose_np, wrap
from omniswarm_tpu.swarm.loop_cam import (
    CameraIntrinsics,
    LoopCam,
    OmniLoopCam,
)
from omniswarm_tpu.swarm.loop_detector import LoopDetector

BASELINE = 0.2


def render_direction_stereo(world, pose, view_yaw, intr, h, w, rng):
    """Stereo pair for one virtual-pinhole direction of a fisheye rig.

    The direction camera is the body camera yawed by ``view_yaw``; its
    stereo baseline lies along the direction's own camera x axis.
    """
    cam_pose = np.asarray(pose, float).copy()
    cam_pose[3] = wrap(cam_pose[3] + view_yaw)
    left = world.render(cam_pose, intr, h, w, rng=rng)
    off_w = _rotz(cam_pose[3]) @ np.array([0.0, -BASELINE, 0.0])
    pose_r = cam_pose.copy()
    pose_r[:3] += off_w
    right = world.render(pose_r, intr, h, w, rng=rng)
    return left, right


@pytest.fixture(scope="module")
def setup():
    p = FrontendParams(accept_loop_yaw_mod=np.pi / 2)
    world = WallWorld(seed=3)
    intr = CameraIntrinsics(fx=220, fy=220, cx=p.width / 2, cy=p.height / 2)
    cam = OmniLoopCam(params=p, intrinsics=intr, baseline=BASELINE)
    return p, world, intr, cam


def make_omni_kf(setup, drone, frame, t, pose, rng):
    """4-direction keyframe; directions not facing the wall render empty."""
    p, world, intr, cam = setup
    pairs = []
    for vy in OmniLoopCam.VIEW_YAWS:
        pairs.append(render_direction_stereo(
            world, pose, vy, intr, p.height, p.width, rng))
    return cam.on_fisheye_frame(drone, frame, t, pose, pairs)


def test_cross_direction_loop(setup):
    """Front-view visit vs side-view revisit (body yawed ~90 deg)."""
    rng = np.random.default_rng(4)
    det = LoopDetector(0, setup[0])
    pose_a = np.array([0.0, 0.2, 0.5, 0.0])
    # revisit with the body rotated: the wall is now in view index 3
    pose_b = np.array([0.25, -0.3, 0.6, np.pi / 2 - 0.05])
    kfa = make_omni_kf(setup, 0, 0, 0.0, pose_a, rng)
    kfb = make_omni_kf(setup, 0, 100, 10.0, pose_b, rng)
    assert kfa.valid.sum() >= 40 and kfb.valid.sum() >= 40
    det.on_keyframe(kfa)
    res = det.on_keyframe(kfb)
    assert res is not None, "cross-direction loop not detected"
    gt = delta_pose_np(pose_b, pose_a)
    err = res.edge.dpose - gt
    err[3] = wrap(err[3])
    assert np.linalg.norm(err[:3]) < 0.25, (res.edge.dpose, gt)
    assert abs(err[3]) < 0.08


def test_mei_fisheye_loop(setup):
    """Loop closure through a distorted MEI fisheye camera model."""
    p, world, _, _ = setup
    mei = MeiCamera(xi=1.2, fx=400, fy=400, cx=p.width / 2, cy=p.height / 2,
                    k1=-0.05, k2=0.01)
    cam = LoopCam(params=p, intrinsics=CameraBearings(mei),
                  baseline=BASELINE)
    rng = np.random.default_rng(5)
    det = LoopDetector(0, setup[0])

    def kf(frame, t, pose):
        left = world.render(pose, mei, p.height, p.width, rng=rng)
        off_w = _rotz(pose[3]) @ np.array([0.0, -BASELINE, 0.0])
        pr = np.asarray(pose, float).copy()
        pr[:3] += off_w
        right = world.render(pr, mei, p.height, p.width, rng=rng)
        return cam.on_stereo_frame(0, frame, t, pose, left, right)

    pose_a = np.array([0.0, 0.3, 0.5, 0.05])
    pose_b = np.array([0.3, -0.3, 0.6, -0.05])
    kfa = kf(0, 0.0, pose_a)
    kfb = kf(100, 10.0, pose_b)
    assert kfa.valid.sum() >= 25, kfa.valid.sum()

    # triangulated landmarks must lie on the wall plane despite distortion
    c, s = np.cos(pose_a[3]), np.sin(pose_a[3])
    p3 = kfa.landmarks_3d[kfa.valid]
    pts_w = np.stack([pose_a[0] + c * p3[:, 0] - s * p3[:, 1],
                      pose_a[1] + s * p3[:, 0] + c * p3[:, 1],
                      pose_a[2] + p3[:, 2]], 1)
    # photo_v2 (r5 default) detects denser, lower-contrast texture points
    # than the magicpoint checkpoint; their stereo triangulation is a
    # touch noisier (median plane distance 0.33 vs 0.29) while matching
    # precision is what the verify path gates on — allow the density
    assert np.median(np.abs(world.plane_distance(pts_w))) < 0.45

    det.on_keyframe(kfa)
    res = det.on_keyframe(kfb)
    assert res is not None, "fisheye loop not detected"
    gt = delta_pose_np(pose_b, pose_a)
    err = res.edge.dpose - gt
    assert np.linalg.norm(err[:3]) < 0.25, (res.edge.dpose, gt)
    assert abs(wrap(err[3])) < 0.08
