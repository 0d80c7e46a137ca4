"""LoopDetector pipeline on synthetic keyframes with shared world landmarks."""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.swarm.comm import KeyframeData
from omniswarm_tpu.swarm.loop_detector import LoopDetector


class World:
    """Shared 3-D landmarks with persistent descriptors; positional global
    descriptors so that physically close keyframes retrieve each other."""

    def __init__(self, seed=0, n_landmarks=400, global_dim=256):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.pts = rng.uniform(-12, 12, size=(n_landmarks, 3))
        self.pts[:, 2] = rng.uniform(0, 5, size=n_landmarks)
        self.desc = rng.normal(size=(n_landmarks, 64)).astype(np.float32)
        self.desc /= np.linalg.norm(self.desc, axis=1, keepdims=True)
        self.gproj = rng.normal(size=(3, global_dim)).astype(np.float32)
        self.global_dim = global_dim

    def global_desc(self, pose):
        """Smooth positional encoding → random projection → unit vector."""
        z = np.concatenate([
            np.sin(self.gproj.T @ (pose[:3] * 0.3)),
            np.cos(self.gproj.T @ (pose[:3] * 0.3))])
        return (z / np.linalg.norm(z)).astype(np.float32)

    def make_keyframe(self, drone, frame, pose, t, max_pts=60,
                      desc_noise=0.02):
        c, s = np.cos(-pose[3]), np.sin(-pose[3])
        d = self.pts - pose[:3]
        body = np.stack([c * d[:, 0] - s * d[:, 1],
                         s * d[:, 0] + c * d[:, 1], d[:, 2]], 1)
        dist = np.linalg.norm(body, axis=1)
        vis = np.flatnonzero((dist > 0.5) & (dist < 8.0))[:max_pts]
        K = max_pts
        p3d = np.zeros((K, 3), np.float32)
        desc = np.zeros((K, 64), np.float32)
        valid = np.zeros(K, bool)
        p3d[:len(vis)] = body[vis]
        dn = self.desc[vis] + self.rng.normal(
            0, desc_noise, size=(len(vis), 64)).astype(np.float32)
        desc[:len(vis)] = dn / np.linalg.norm(dn, axis=1, keepdims=True)
        valid[:len(vis)] = True
        return KeyframeData(
            drone_id=drone, frame_id=frame, t=t, pose=pose.astype(np.float32),
            global_desc=self.global_desc(pose),
            kp_xy=np.zeros((K, 2), np.float32),
            landmarks_3d=p3d, local_desc=desc, valid=valid)


@pytest.fixture
def world():
    return World(seed=5)


def test_inter_drone_loop_found_with_correct_pose(world):
    det = LoopDetector(self_id=0, params=FrontendParams(
        max_db_size=256, min_loop_matches=12, match_index_dist=5,
        netvlad_thres=0.5, pnp_iterations=128),
        global_dim=world.global_desc(np.zeros(4)).shape[0], seed=0)
    # drone 1 visits a spot
    pose_b = np.array([1.0, 2.0, 1.0, 0.4])
    kf_b = world.make_keyframe(1, 0, pose_b, t=0.0)
    assert det.on_keyframe(kf_b) is None       # first frame, empty DB
    # drone 0 visits nearly the same spot later (relative yaw within the
    # 30° accept_loop_max_yaw gate)
    pose_a = np.array([1.5, 1.6, 1.1, 0.15])
    kf_a = world.make_keyframe(0, 0, pose_a, t=5.0)
    cand = det.on_keyframe(kf_a)
    assert cand is not None, "loop not detected"
    assert cand.edge.drone_a == 0 and cand.edge.drone_b == 1
    # measured dpose ≈ true relative pose a^-1 b
    c, s = np.cos(-pose_a[3]), np.sin(-pose_a[3])
    d = pose_b[:3] - pose_a[:3]
    true_dp = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2],
                        pose_b[3] - pose_a[3]])
    np.testing.assert_allclose(cand.edge.dpose[:3], true_dp[:3], atol=0.1)
    assert abs(cand.edge.dpose[3] - true_dp[3]) < 0.05


def test_recency_guard_blocks_adjacent_frames(world):
    det = LoopDetector(self_id=0, params=FrontendParams(
        max_db_size=256, min_loop_matches=12, match_index_dist=10,
        netvlad_thres=0.5),
        global_dim=world.global_desc(np.zeros(4)).shape[0], seed=0)
    pose = np.array([0.0, 0.0, 1.0, 0.0])
    det.on_keyframe(world.make_keyframe(0, 0, pose, t=0.0))
    # immediately-next frame at the same place: must NOT self-match
    cand = det.on_keyframe(world.make_keyframe(0, 1, pose + 0.05, t=1.0))
    assert cand is None


def test_far_places_do_not_match(world):
    det = LoopDetector(self_id=0, params=FrontendParams(
        max_db_size=256, min_loop_matches=12, match_index_dist=5,
        netvlad_thres=0.5),
        global_dim=world.global_desc(np.zeros(4)).shape[0], seed=0)
    det.on_keyframe(world.make_keyframe(1, 0, np.array([0, 0, 1.0, 0.0]), 0.0))
    cand = det.on_keyframe(
        world.make_keyframe(0, 0, np.array([11.0, -11.0, 1.0, 1.0]), 5.0))
    assert cand is None


def test_intra_drone_loop_odometry_gate(world):
    det = LoopDetector(self_id=0, params=FrontendParams(
        max_db_size=256, min_loop_matches=12, match_index_dist=3,
        netvlad_thres=0.5, pnp_iterations=128),
        global_dim=world.global_desc(np.zeros(4)).shape[0], seed=0)
    pose0 = np.array([2.0, -1.0, 1.0, 0.2])
    det.on_keyframe(world.make_keyframe(0, 0, pose0, t=0.0))
    # same drone revisits; VIO pose is consistent → accepted
    pose1 = pose0 + np.array([0.4, 0.3, 0.0, 0.1])
    cand = det.on_keyframe(world.make_keyframe(0, 10, pose1, t=10.0))
    assert cand is not None
    assert cand.edge.drone_a == 0 and cand.edge.drone_b == 0


def test_match_viz_png_written(world, tmp_path):
    """Accepted loops dump side-by-side match PNGs when opted in
    (loop_detector.cpp:695-785 DEBUG_IMAGE parity)."""
    det = LoopDetector(self_id=0, params=FrontendParams(
        max_db_size=256, min_loop_matches=12, match_index_dist=5,
        netvlad_thres=0.5, pnp_iterations=128),
        global_dim=world.global_desc(np.zeros(4)).shape[0], seed=0,
        match_viz_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(60, 80)).astype(np.float32)
    det.register_image(1, 0, img)
    det.register_image(0, 0, img.T[:60, :60])
    det.on_keyframe(world.make_keyframe(1, 0, np.array([1.0, 2.0, 1.0, 0.4]),
                                        t=0.0))
    cand = det.on_keyframe(
        world.make_keyframe(0, 0, np.array([1.5, 1.6, 1.1, 0.15]), t=5.0))
    assert cand is not None
    pngs = list(tmp_path.glob("loop_*.png"))
    assert len(pngs) == 1 and pngs[0].stat().st_size > 1000


def test_match_viz_disabled_keeps_no_images(world):
    det = LoopDetector(self_id=0, global_dim=world.global_desc(
        np.zeros(4)).shape[0])
    det.register_image(0, 0, np.zeros((4, 4)))
    assert not det._images


def test_balanced_db_candidates_recovers_starved_db(world):
    """Per-DB candidate quotas (balanced_db_candidates): with k=1 the
    similarity-merged top-k keeps only ONE lane across both databases, so
    the lower-similarity database's true revisit is never even verified;
    balanced mode keeps both DBs' top-k lanes and the inlier-ordered walk
    accepts both loops."""
    gdim = world.global_desc(np.zeros(4)).shape[0]

    def build(balanced):
        det = LoopDetector(self_id=0, params=FrontendParams(
            max_db_size=256, min_loop_matches=12, match_index_dist=3,
            netvlad_thres=0.5, pnp_iterations=128, search_nearest_num=1,
            max_loops_per_query=2, balanced_db_candidates=balanced),
            global_dim=gdim, seed=0)
        spot = np.array([1.0, 2.0, 1.0, 0.3])
        # own history at the spot + a remote keyframe at the same spot
        det.on_keyframe(world.make_keyframe(0, 0, spot, t=0.0))
        det.on_keyframe(world.make_keyframe(
            1, 0, spot + np.array([0.2, -0.1, 0.0, 0.05]), t=1.0))
        # revisit: both DBs hold a true loop for this query
        return det.on_keyframe_multi(world.make_keyframe(
            0, 10, spot + np.array([0.3, 0.2, 0.1, -0.05]), t=10.0))

    merged = build(False)
    balanced = build(True)
    assert len(merged) <= 1                  # one lane -> at most one loop
    assert len(balanced) == 2, "balanced mode must verify both DB lanes"
    pairs = {(lp.edge.drone_a, lp.edge.drone_b) for lp in balanced}
    assert pairs == {(0, 0), (0, 1)}
