"""Image-level loop closure: rendered stereo pairs through the real CNN stack.

The deepest integration tier — actual images with exact multi-view geometry
(sim/image_world.WallWorld) driven through SuperPoint keypoints +
descriptors, NetVLAD place recognition, matmul mutual matching, stereo
triangulation, and 4-DoF PnP RANSAC, validated against the ground-truth
relative pose. This covers the role of the reference's recorded camera bags
for swarm_loop (loop_cam.cpp / loop_detector.cpp) without any data
downloads.
"""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.sim.image_world import WallWorld
from omniswarm_tpu.sim.simulator import delta_pose_np, wrap
from omniswarm_tpu.swarm.loop_cam import CameraIntrinsics, LoopCam
from omniswarm_tpu.swarm.loop_detector import LoopDetector

BASELINE = 0.2


@pytest.fixture(scope="module")
def setup():
    p = FrontendParams()
    world = WallWorld(seed=3)
    intr = CameraIntrinsics(fx=220, fy=220, cx=p.width / 2, cy=p.height / 2)
    cam = LoopCam(params=p, intrinsics=intr, baseline=BASELINE)
    return p, world, intr, cam


def make_kf(setup, drone, frame, t, pose, rng):
    p, world, intr, cam = setup
    L, R = world.render_stereo(pose, intr, p.height, p.width, BASELINE,
                               rng=rng)
    return cam.on_stereo_frame(drone, frame, t, pose, L, R)


def test_stereo_landmarks_on_wall(setup):
    rng = np.random.default_rng(0)
    pose = np.array([0.0, 0.3, 0.5, 0.05])
    kf = make_kf(setup, 0, 0, 0.0, pose, rng)
    v = np.asarray(kf.valid)
    assert v.sum() >= 40
    # triangulated landmarks must lie on the (tilted) wall plane
    c, s = np.cos(pose[3]), np.sin(pose[3])
    p3 = kf.landmarks_3d[v]
    pts_w = np.stack([pose[0] + c * p3[:, 0] - s * p3[:, 1],
                      pose[1] + s * p3[:, 0] + c * p3[:, 1],
                      pose[2] + p3[:, 2]], 1)
    err = np.abs(setup[1].plane_distance(pts_w))
    assert np.median(err) < 0.15, np.median(err)


def test_image_loop_closure_intra_drone(setup):
    """Two revisits of the wall close a loop with the correct 4-DoF pose."""
    rng = np.random.default_rng(1)
    det = LoopDetector(0, setup[0])
    pose_a = np.array([0.0, 0.3, 0.5, 0.05])
    pose_b = np.array([0.3, -0.4, 0.6, -0.03])
    kfa = make_kf(setup, 0, 0, 0.0, pose_a, rng)
    kfb = make_kf(setup, 0, 100, 10.0, pose_b, rng)
    assert det.on_keyframe(kfa) is None          # empty database
    res = det.on_keyframe(kfb)
    assert res is not None, "loop not detected"
    assert res.similarity > 0.5
    assert res.num_inliers >= 15
    # edge a→b convention: a = new (kfb), b = old (kfa)
    gt = delta_pose_np(pose_b, pose_a)
    err = res.edge.dpose - gt
    assert np.linalg.norm(err[:3]) < 0.15, (res.edge.dpose, gt)
    assert abs(wrap(err[3])) < 0.05


def test_image_loop_closure_inter_drone(setup):
    """A keyframe received from another drone closes an inter-drone loop."""
    rng = np.random.default_rng(2)
    det = LoopDetector(0, setup[0])
    pose_a = np.array([-0.2, 0.5, 0.4, 0.0])
    pose_b = np.array([0.25, -0.3, 0.7, 0.06])
    kf_self = make_kf(setup, 0, 5, 0.5, pose_a, rng)
    kf_peer = make_kf(setup, 2, 7, 0.7, pose_b, rng)
    det.on_keyframe(kf_self)
    res = det.on_keyframe(kf_peer)
    assert res is not None, "inter-drone loop not detected"
    assert {res.edge.drone_a, res.edge.drone_b} == {0, 2}
    gt = delta_pose_np(pose_b, pose_a)           # new (peer) → old (self)
    err = res.edge.dpose - gt
    assert np.linalg.norm(err[:3]) < 0.2, (res.edge.dpose, gt)
    assert abs(wrap(err[3])) < 0.06


def test_no_loop_for_unseen_place(setup):
    """A view of bare background must not match the textured wall."""
    p, world, intr, cam = setup
    rng = np.random.default_rng(3)
    det = LoopDetector(0, p)
    pose_a = np.array([0.0, 0.3, 0.5, 0.05])
    det.on_keyframe(make_kf(setup, 0, 0, 0.0, pose_a, rng))
    # far off the texture: the wall sample falls outside -> flat image
    pose_far = np.array([0.0, 30.0, 0.5, 0.0])
    kf_far = make_kf(setup, 0, 100, 10.0, pose_far, rng)
    res = det.on_keyframe(kf_far)
    assert res is None


def test_room_world_geometry():
    """RoomWorld: rays hit the nearest wall; all four walls texture."""
    from omniswarm_tpu.sim.image_world import RoomWorld

    world = RoomWorld(half=6.0, seed=11)
    intr = CameraIntrinsics(fx=220, fy=220, cx=200, cy=104)
    means = []
    for yaw in (0.0, np.pi / 2, np.pi, -np.pi / 2):
        img = world.render(np.array([1.0, 0.5, 1.2, yaw]), intr, 208, 400)
        assert img.shape == (208, 400) and np.isfinite(img).all()
        means.append(float(img.std()))
    # every direction sees textured structure, not the bare background
    assert min(means) > 0.05, means
