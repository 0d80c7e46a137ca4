"""Loop-detector parity features (VERDICT r1 item 3).

Covers: local/remote database split with query routing, per-mode (init vs
normal) thresholds, top-k candidate evaluation, prevent_adding_db,
covariance-scaled odometry-consistency gate, and precision/recall under
injected perceptual aliasing (tiled wall texture).

Reference: loop_detector.h:22-29 (two faiss indices), loop_detector.cpp
:176-242 (routing + thresholds), :295-315 (odometry consistency),
:539-624 (homography prefilter), swarm_loop.cpp:155-158 (prevent_adding_db).
"""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.sim.simulator import delta_pose_np, pose_mul_np, wrap
from omniswarm_tpu.swarm.comm import KeyframeData
from omniswarm_tpu.swarm.loop_detector import LoopDetector

GDIM = 64
K = 64
FX = 220.0


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def make_world_points(rng, n=K):
    """Roughly planar 3-D points ~3 m ahead (so the homography holds)."""
    y = rng.uniform(-2.0, 2.0, n)
    z = rng.uniform(-1.0, 1.0, n)
    x = 3.0 + 0.12 * rng.normal(size=n)
    return np.stack([x, y, z], 1).astype(np.float32)


def body_frame(points_w, pose):
    c, s = np.cos(pose[3]), np.sin(pose[3])
    d = points_w - pose[:3]
    return np.stack([c * d[:, 0] + s * d[:, 1],
                     -s * d[:, 0] + c * d[:, 1],
                     d[:, 2]], 1).astype(np.float32)


def project(p3):
    """Pinhole pixels: x forward, y left, z up."""
    x = np.maximum(p3[:, 0], 0.1)
    u = 200.0 - FX * p3[:, 1] / x
    v = 104.0 - FX * p3[:, 2] / x
    return np.stack([u, v], 1).astype(np.float32)


def make_kf(drone, frame, t, pose, points_w, gdesc, ldesc):
    p3 = body_frame(points_w, np.asarray(pose, float))
    return KeyframeData(
        drone_id=drone, frame_id=frame, t=t,
        pose=np.asarray(pose, np.float32),
        global_desc=unit(gdesc), kp_xy=project(p3),
        landmarks_3d=p3, local_desc=ldesc,
        valid=np.ones(K, bool))


@pytest.fixture
def scene(rng):
    points = make_world_points(rng)
    ldesc = rng.normal(size=(K, 32)).astype(np.float32)
    ldesc /= np.linalg.norm(ldesc, axis=1, keepdims=True)
    g1 = rng.normal(size=GDIM)
    return points, ldesc, g1


def test_local_remote_db_split(scene, rng):
    """Remote keyframes query only the local DB: two remote keyframes of
    the same place must NOT close a remote-remote loop."""
    points, ldesc, g = scene
    det = LoopDetector(0, FrontendParams(), global_dim=GDIM)
    kf1 = make_kf(2, 0, 0.0, [0, 0, 0, 0], points, g, ldesc)
    kf2 = make_kf(2, 50, 5.0, [0.3, -0.2, 0.1, 0.04], points, g, ldesc)
    assert det.on_keyframe(kf1) is None
    res = det.on_keyframe(kf2)
    assert res is None, "remote-remote pair must not match (local DB only)"
    assert len(det.remote_kfs) == 2 and len(det.local_kfs) == 0

    # but a SELF keyframe of the same place matches the remote DB
    kf_self = make_kf(0, 3, 6.0, [0.1, 0.4, -0.1, -0.03], points, g, ldesc)
    res = det.on_keyframe(kf_self)
    assert res is not None
    assert {res.edge.drone_a, res.edge.drone_b} == {0, 2}
    assert len(det.local_kfs) == 1


def test_loop_edge_pose_accuracy(scene):
    """The synthetic-scene loop edge recovers the true relative pose."""
    points, ldesc, g = scene
    det = LoopDetector(0, FrontendParams(), global_dim=GDIM)
    pose_a = np.array([0.0, 0.0, 0.0, 0.0])
    pose_b = np.array([0.4, -0.3, 0.15, 0.06])
    det.on_keyframe(make_kf(0, 0, 0.0, pose_a, points, g, ldesc))
    res = det.on_keyframe(make_kf(0, 50, 5.0, pose_b, points, g, ldesc))
    assert res is not None
    gt = delta_pose_np(pose_b, pose_a)
    err = res.edge.dpose - gt
    assert np.linalg.norm(err[:3]) < 0.05, (res.edge.dpose, gt)
    assert abs(wrap(err[3])) < 0.02


def test_per_mode_thresholds(scene, rng):
    """Init mode accepts a weaker NetVLAD similarity for an uninitialized
    inter-drone pair; the same similarity is rejected once initialized."""
    points, ldesc, g1 = scene
    p = FrontendParams(netvlad_thres=0.5, netvlad_init_thres=0.2,
                       inter_drone_init_frames=1)
    # a partially-similar global descriptor: inner product ~0.35
    g_weak = unit(unit(g1) * 0.35 + np.sqrt(1 - 0.35 ** 2) * unit(
        rng.normal(size=GDIM) - unit(g1) * (unit(rng.normal(size=GDIM)) @ unit(g1))))

    det = LoopDetector(0, p, global_dim=GDIM)
    det.on_keyframe(make_kf(0, 0, 0.0, [0, 0, 0, 0], points, g1, ldesc))
    # pair (0,2) uninitialized -> init mode -> 0.35 >= 0.2 accepted
    kf_r = make_kf(2, 10, 1.0, [0.2, 0.1, 0.0, 0.02], points, g_weak, ldesc)
    res = det.on_keyframe(kf_r)
    assert res is not None
    sim_val = res.similarity
    assert p.netvlad_init_thres <= sim_val < p.netvlad_thres

    # pair now initialized (inter_drone_init_frames=1): same weak
    # similarity must be rejected under the normal threshold
    kf_r2 = make_kf(2, 90, 9.0, [0.25, 0.05, 0.0, 0.0], points, g_weak,
                    ldesc)
    res2 = det.on_keyframe(kf_r2)
    assert res2 is None


def test_topk_candidate_evaluation(scene, rng):
    """A decoy with HIGHER global similarity but garbage geometry must not
    mask the real match (top-1-only behavior would return nothing)."""
    points, ldesc, g1 = scene
    det = LoopDetector(0, FrontendParams(search_nearest_num=5),
                       global_dim=GDIM)
    # decoy: same global descriptor, random unrelated landmarks/descriptors
    decoy_ldesc = rng.normal(size=(K, 32)).astype(np.float32)
    decoy_ldesc /= np.linalg.norm(decoy_ldesc, axis=1, keepdims=True)
    decoy_pts = make_world_points(rng) + np.array([0, 30.0, 0])
    det.on_keyframe(make_kf(2, 0, 0.0, [0, 25, 0, 0], decoy_pts, g1,
                            decoy_ldesc))
    # real match: slightly weaker similarity
    g_real = unit(np.asarray(g1) + 0.1 * rng.normal(size=GDIM))
    det.on_keyframe(make_kf(3, 0, 0.0, [0, 0, 0, 0], points, g_real, ldesc))

    kf = make_kf(0, 5, 1.0, [0.3, -0.1, 0.1, 0.03], points, g1, ldesc)
    res = det.on_keyframe(kf)
    assert res is not None, "second-best candidate must be evaluated"
    assert {res.edge.drone_a, res.edge.drone_b} == {0, 3}


def test_prevent_adding_db(scene):
    """Match-only frames query but never enter the database."""
    points, ldesc, g = scene
    det = LoopDetector(0, FrontendParams(), global_dim=GDIM)
    det.on_keyframe(make_kf(2, 0, 0.0, [0, 0, 0, 0], points, g, ldesc))
    kf = make_kf(0, 1, 1.0, [0.2, 0.2, 0.0, 0.0], points, g, ldesc)
    res = det.on_keyframe(kf, prevent_adding_db=True)
    assert res is not None            # still matches the remote DB
    assert len(det.local_kfs) == 0    # but was not added
    assert int(det.local_db.cursor) == 0


def test_odometry_consistency_gate(scene):
    """Intra-drone loops inconsistent with VIO (scaled by drift covariance)
    are rejected; consistent ones pass; the threshold knob moves the gate."""
    points, ldesc, g = scene
    pose_a = np.array([0.0, 0.0, 0.0, 0.0])
    pose_b = np.array([0.4, -0.3, 0.15, 0.06])

    det = LoopDetector(0, FrontendParams(), global_dim=GDIM)
    kfa = make_kf(0, 0, 0.0, pose_a, points, g, ldesc)
    det.on_keyframe(kfa)
    # lie about the VIO pose of the revisit: claims to be 2 m away from
    # where the geometry says it is -> gate must reject
    kfb_lie = make_kf(0, 50, 5.0, pose_b, points, g, ldesc)
    kfb_lie.pose = np.array([2.0, 1.5, 0.0, 0.0], np.float32)
    assert det.on_keyframe(kfb_lie) is None

    # honest VIO passes
    det2 = LoopDetector(0, FrontendParams(), global_dim=GDIM)
    det2.on_keyframe(kfa)
    assert det2.on_keyframe(
        make_kf(0, 50, 5.0, pose_b, points, g, ldesc)) is not None

    # a huge threshold disables the gate
    det3 = LoopDetector(0, FrontendParams(
        odometry_consistency_threshold=1e9), global_dim=GDIM)
    det3.on_keyframe(kfa)
    kfb_lie2 = make_kf(0, 50, 5.0, pose_b, points, g, ldesc)
    kfb_lie2.pose = np.array([2.0, 1.5, 0.0, 0.0], np.float32)
    assert det3.on_keyframe(kfb_lie2) is not None


# ---------------------------------------------------------------------------
# image-level: precision/recall under perceptual aliasing
# ---------------------------------------------------------------------------

def test_aliasing_precision(rng):
    """Tiled (periodic) wall texture: different wall segments look alike.

    The detector must reject cross-segment matches (precision) while still
    closing the true revisit (recall). Exercises the homography prefilter +
    PnP + odometry-consistency stack on aliased imagery."""
    from omniswarm_tpu.sim.image_world import WallWorld
    from omniswarm_tpu.swarm.loop_cam import CameraIntrinsics, LoopCam

    p = FrontendParams()
    world = WallWorld(seed=7)
    # inject perceptual aliasing: tile a small patch periodically
    patch = world.texture[:128, :128]
    world.texture = np.tile(patch, (world.tex_h // 128,
                                    world.tex_w // 128)).astype(np.float32)
    intr = CameraIntrinsics(fx=220, fy=220, cx=p.width / 2, cy=p.height / 2)
    cam = LoopCam(params=p, intrinsics=intr, baseline=0.2)
    det = LoopDetector(0, p)

    period = 128 * world.m_per_px       # 5.12 m world-space texture period
    # two passes along the wall; keyframes one period apart look identical
    poses = []
    for rep in range(2):
        for iy, y in enumerate(np.linspace(-period, period, 5)):
            poses.append(np.array([0.0, y, 0.5 + 0.01 * rep, 0.0]))
    accepted = []
    for i, pose in enumerate(poses):
        L, R = world.render_stereo(pose, intr, p.height, p.width, 0.2,
                                   rng=rng)
        kf = cam.on_stereo_frame(0, i * 20, float(i), pose, L, R)
        res = det.on_keyframe(kf)
        if res is not None:
            accepted.append((i, pose, res))

    # classify accepted loops by ground truth: a loop is TRUE iff its
    # measured relative pose matches the GT relative pose of its endpoints
    # (an aliased match reports ~one-texture-period offset from truth)
    n_true = n_false = 0
    for i, pose, res in accepted:
        old_pose = poses[int(round(res.edge.t_b))]
        gt = delta_pose_np(pose, old_pose)
        if np.linalg.norm(res.edge.dpose[:3] - gt[:3]) < 0.5:
            n_true += 1
        else:
            n_false += 1
    # precision: aliased (far-apart) matches must be rejected
    assert n_false == 0, f"{n_false} aliased loops accepted"
    # recall: the second pass must close loops against the first
    assert n_true >= 2, f"only {n_true} true loops"
