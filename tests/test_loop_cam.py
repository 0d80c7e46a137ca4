"""LoopCam keyframe builder: stereo triangulation + depth back-projection.

Uses injected fake extractors with controlled keypoints/descriptors so the
geometry paths (matching, triangulation, back-projection) are exactly
verifiable without trained CNN weights.
"""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.swarm.loop_cam import CameraIntrinsics, LoopCam, CAM_TO_BODY


class FakeKeypointExtractor:
    """Projects known 3-D points into each image and returns matching
    descriptors, emulating a perfect SuperPoint."""

    def __init__(self, pts_cam, intr, baseline, K=32, desc_dim=64, seed=0):
        self.pts = pts_cam
        self.intr = intr
        self.baseline = baseline
        self.K = K
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(len(pts_cam), desc_dim)).astype(np.float32)
        self.desc = d / np.linalg.norm(d, axis=1, keepdims=True)

    def __call__(self, imgs):
        import jax.numpy as jnp

        B = imgs.shape[0]
        xy = np.zeros((B, self.K, 2), np.float32)
        desc = np.zeros((B, self.K, self.desc.shape[1]), np.float32)
        valid = np.zeros((B, self.K), bool)
        scores = np.zeros((B, self.K), np.float32)
        for b in range(B):
            offset = np.array([self.baseline * b, 0.0, 0.0])
            for i, p in enumerate(self.pts[: self.K]):
                q = p - offset
                xy[b, i] = [self.intr.fx * q[0] / q[2] + self.intr.cx,
                            self.intr.fy * q[1] / q[2] + self.intr.cy]
                desc[b, i] = self.desc[i]
                valid[b, i] = True
                scores[b, i] = 1.0
        return (jnp.asarray(xy), jnp.asarray(scores), jnp.asarray(desc),
                jnp.asarray(valid))


class FakeGlobalExtractor:
    def __call__(self, imgs):
        import jax.numpy as jnp

        B = imgs.shape[0]
        v = np.ones((B, 64), np.float32)
        return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))


@pytest.fixture
def scene(rng):
    pts = rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 6.0, size=32)
    return pts


def test_stereo_keyframe_triangulation(scene):
    p = FrontendParams(width=400, height=208)
    intr = CameraIntrinsics(fx=200, fy=200, cx=200, cy=104)
    baseline = 0.12
    cam = LoopCam(params=p, intrinsics=intr, baseline=baseline,
                  keypoint_extractor=FakeKeypointExtractor(
                      scene, intr, baseline),
                  global_extractor=FakeGlobalExtractor())
    kf = cam.on_stereo_frame(
        drone_id=2, frame_id=5, t=1.0, vio_pose=np.zeros(4),
        left=np.zeros((208, 400), np.float32),
        right=np.zeros((208, 400), np.float32))
    assert kf.drone_id == 2 and kf.frame_id == 5
    ok = np.asarray(kf.valid)
    assert ok.sum() >= 25, ok.sum()
    # triangulated body-frame landmarks match the projected GT points
    # (pixel quantization in the fake extractor costs a few cm)
    expected = scene @ CAM_TO_BODY.T
    got = np.asarray(kf.landmarks_3d)
    err = np.linalg.norm(got[ok] - expected[ok], axis=1)
    assert np.median(err) < 0.25, np.median(err)


def test_depth_keyframe_backprojection(scene):
    p = FrontendParams(width=400, height=208)
    intr = CameraIntrinsics(fx=200, fy=200, cx=200, cy=104)
    cam = LoopCam(params=p, intrinsics=intr,
                  keypoint_extractor=FakeKeypointExtractor(scene, intr, 0.0),
                  global_extractor=FakeGlobalExtractor())
    # dense depth image consistent with the scene points at their pixels
    depth = np.full((208, 400), 4.0, np.float32)
    for pt in scene:
        u = int(round(200 * pt[0] / pt[2] + 200))
        v = int(round(200 * pt[1] / pt[2] + 104))
        if 0 <= v < 208 and 0 <= u < 400:
            depth[v, u] = pt[2]
    kf = cam.on_depth_frame(
        drone_id=0, frame_id=0, t=0.0, vio_pose=np.zeros(4),
        gray=np.zeros((208, 400), np.float32), depth=depth)
    ok = np.asarray(kf.valid)
    assert ok.sum() >= 20
    expected = scene @ CAM_TO_BODY.T
    got = np.asarray(kf.landmarks_3d)
    err = np.linalg.norm(got[ok] - expected[ok], axis=1)
    assert np.median(err) < 0.3, np.median(err)


def test_real_models_smoke():
    """Full pipeline with the actual Flax models (random weights)."""
    p = FrontendParams(width=96, height=64, max_keypoints=32,
                       global_desc_dim=256)
    cam = LoopCam(params=p)
    rng = np.random.default_rng(0)
    left = rng.uniform(size=(64, 96)).astype(np.float32)
    right = np.roll(left, -2, axis=1)     # crude disparity
    kf = cam.on_stereo_frame(0, 0, 0.0, np.zeros(4), left, right)
    assert kf.local_desc.shape[1] == p.local_desc_dim
    assert kf.global_desc.shape == (256,)
    assert np.isfinite(kf.landmarks_3d).all()


def test_omnidirectional_merge(scene):
    from omniswarm_tpu.swarm.loop_cam import OmniLoopCam, yaw_rotate_np

    p = FrontendParams(width=400, height=208)
    intr = CameraIntrinsics(fx=200, fy=200, cx=200, cy=104)
    baseline = 0.12
    cam = OmniLoopCam(params=p, intrinsics=intr, baseline=baseline,
                      keypoint_extractor=FakeKeypointExtractor(
                          scene, intr, baseline),
                      global_extractor=FakeGlobalExtractor())
    blank = np.zeros((208, 400), np.float32)
    # two directions populated (front + left), two missing
    kf = cam.on_fisheye_frame(
        1, 0, 0.0, np.zeros(4),
        [(blank, blank), (blank, blank), None, None])
    ok = np.asarray(kf.valid)
    assert ok.sum() >= 50                      # ~2 views x ~28 landmarks
    # the left-view landmarks must be the front ones rotated by +90°
    K = 32
    front = kf.landmarks_3d[:K]
    left = kf.landmarks_3d[K:2 * K]
    ok_f, ok_l = ok[:K], ok[K:2 * K]
    both = ok_f & ok_l
    expected_left = yaw_rotate_np(np.pi / 2, front)
    np.testing.assert_allclose(left[both], expected_left[both], atol=1e-4)
    # global descriptor unit-norm
    np.testing.assert_allclose(np.linalg.norm(kf.global_desc), 1.0, atol=1e-5)
