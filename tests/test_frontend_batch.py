"""Fused/batched front-end paths: extraction batch + fixed-C verify.

VERDICT r3 item 2: all directions/drones extract as one dispatch and the
candidate walk verifies a fixed-C batch in one dispatch. These tests pin
(a) fused-kernel equivalence with the per-stage fallback path, and
(b) batched-verify equivalence with the sequential candidate walk.
"""
import numpy as np
import pytest

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.swarm.loop_cam import CameraIntrinsics, LoopCam, OmniLoopCam


H, W = 64, 96


@pytest.fixture(scope="module")
def cam_pair():
    """Two LoopCams sharing ONE weight set: fused and fallback-forced."""
    from omniswarm_tpu.models.netvlad import GlobalDescriptorExtractor
    from omniswarm_tpu.models.superpoint import SuperPointExtractor

    p = FrontendParams(width=W, height=H, max_keypoints=64,
                       superpoint_thres=-1.0)
    intr = CameraIntrinsics(fx=80, fy=80, cx=W / 2, cy=H / 2)
    kp = SuperPointExtractor(height=H, width=W, max_keypoints=64,
                             threshold=-1.0, seed=1)
    gd = GlobalDescriptorExtractor(height=H, width=W, out_dim=256,
                                   num_clusters=4, seed=2)
    fused = LoopCam(params=p, intrinsics=intr, baseline=0.2,
                    keypoint_extractor=kp, global_extractor=gd)

    class _Wrap:                       # hides the flax contract → fallback
        def __init__(self, inner):
            self._inner = inner

        def __call__(self, imgs):
            return self._inner(imgs)

    class _WrapG:
        def __init__(self, inner):
            self._inner = inner

        def __call__(self, imgs):
            return self._inner(imgs)

    fall = LoopCam(params=p, intrinsics=intr, baseline=0.2,
                   keypoint_extractor=_Wrap(kp), global_extractor=_WrapG(gd))
    return fused, fall


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, size=(n, H, W)).astype(np.float32)
    # smooth a little so keypoints aren't pure noise
    base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3
    return base


def test_fused_matches_fallback(cam_pair):
    fused, fall = cam_pair
    lefts = _images(3, seed=5)
    rights = np.clip(lefts + _images(3, seed=6) * 0.01, 0, 1)
    xy_a, d_a, g_a, p_a, ok_a = fused.extract_stereo_batch(lefts, rights)
    xy_b, d_b, g_b, p_b, ok_b = fall.extract_stereo_batch(lefts, rights)
    assert fused._ensure_fused() and not fall._ensure_fused()
    # f16 wire format: subpixel coords agree to f16 resolution (~0.06 at
    # image width), descriptors/global to half precision
    np.testing.assert_allclose(xy_a, xy_b, atol=0.1)
    np.testing.assert_allclose(g_a, g_b, atol=5e-3)
    np.testing.assert_allclose(d_a, d_b, atol=5e-3)
    assert (ok_a == ok_b).mean() > 0.98
    both = ok_a & ok_b
    np.testing.assert_allclose(p_a[both], p_b[both], atol=5e-2)


def test_fused_uint8_matches_float(cam_pair):
    """uint8 wire format must equal the float path up to quantization —
    especially the NetVLAD global descriptor, which reads the NORMALIZED
    batch (ADVICE r4 high: raw 0-255 inputs made gdesc cosine ~0.35)."""
    fused, _ = cam_pair
    lefts = _images(3, seed=21)
    rights = np.clip(lefts + _images(3, seed=22) * 0.01, 0, 1)
    l8 = np.round(lefts * 255.0).astype(np.uint8)
    r8 = np.round(rights * 255.0).astype(np.uint8)
    xy_f, d_f, g_f, p_f, ok_f = fused.extract_stereo_batch(
        l8.astype(np.float32) / 255.0, r8.astype(np.float32) / 255.0)
    xy_u, d_u, g_u, p_u, ok_u = fused.extract_stereo_batch(l8, r8)
    gf = np.asarray(g_f, np.float32)
    gu = np.asarray(g_u, np.float32)
    cos = (gf * gu).sum(1) / (
        np.linalg.norm(gf, axis=1) * np.linalg.norm(gu, axis=1))
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(d_u, d_f, atol=5e-3)
    np.testing.assert_allclose(xy_u, xy_f, atol=0.1)


def test_batch_bucketing_pads_and_unpads(cam_pair):
    fused, _ = cam_pair
    lefts = _images(5, seed=9)
    rights = np.clip(lefts + 0.005, 0, 1)
    xy, d, g, p, ok = fused.extract_stereo_batch(lefts, rights)
    assert xy.shape[0] == 5 and g.shape[0] == 5
    # same first row as a single-pair call (bucket pad must not leak)
    xy1, d1, g1, p1, ok1 = fused.extract_stereo_batch(
        lefts[:1], rights[:1])
    np.testing.assert_allclose(g[0], g1[0], atol=5e-3)
    np.testing.assert_allclose(xy[0], xy1[0], atol=0.1)


def _make_kf(drone, frame, t, pose, pts_body, gdesc, ldesc, K=48):
    from omniswarm_tpu.swarm.comm import KeyframeData

    n = len(pts_body)
    lm = np.zeros((K, 3), np.float32)
    lm[:n] = pts_body
    de = np.zeros((K, ldesc.shape[1]), np.float32)
    de[:n] = ldesc[:n]
    va = np.zeros(K, bool)
    va[:n] = True
    kp = np.zeros((K, 2), np.float32)
    return KeyframeData(drone_id=drone, frame_id=frame, t=t,
                        pose=np.asarray(pose, np.float32),
                        global_desc=gdesc.astype(np.float32), kp_xy=kp,
                        landmarks_3d=lm, local_desc=de, valid=va)


def _scene_descs(rng, n=40, dim=32):
    d = rng.normal(size=(n, dim)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _gdesc(rng_or_vec, dim=64):
    v = rng_or_vec if isinstance(rng_or_vec, np.ndarray) else \
        rng_or_vec.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def test_batched_verify_matches_walk():
    """verify_batch=True finds the same best loop as the sequential walk,
    and may add verified runners-up (never unverified ones)."""
    from omniswarm_tpu.swarm.loop_detector import LoopDetector

    rng = np.random.default_rng(11)
    pts = rng.uniform(-2, 2, size=(40, 3)).astype(np.float32)
    pts[:, 0] += 4.0
    ldesc = _scene_descs(rng)
    g = _gdesc(rng)

    def build(verify_batch):
        p = FrontendParams(min_loop_matches=15, homography_prefilter=False,
                           verify_batch=verify_batch,
                           netvlad_thres=0.3, match_index_dist=1)
        det = LoopDetector(0, p, global_dim=64, seed=4)
        # two prior keyframes of the same place (slightly different noise)
        for f, dt in ((0, 0.0), (1, 1.0)):
            noise = rng.normal(0, 0.01, size=pts.shape).astype(np.float32)
            det.on_keyframe(_make_kf(0, f, dt, [0, 0, 0, 0], pts + noise,
                                     _gdesc(g + 0.01 * f), ldesc))
        kf = _make_kf(0, 9, 9.0, [0.2, 0, 0, 0], pts - [0.2, 0, 0],
                      _gdesc(g + 0.002), ldesc)
        return det.on_keyframe_multi(kf)

    walk = build(False)
    batch = build(True)
    assert len(walk) == 1
    assert 1 <= len(batch) <= 2
    np.testing.assert_allclose(batch[0].edge.dpose, walk[0].edge.dpose,
                               atol=0.05)
    # runners-up must also be true loops (pose near the same truth)
    for c in batch[1:]:
        np.testing.assert_allclose(c.edge.dpose[:3], walk[0].edge.dpose[:3],
                                   atol=0.1)


def test_payload_ring_survives_wraparound():
    """Device payload rings stay slot-consistent with the descriptor ring
    after the DB wraps: loops verified via the gather kernel must match
    the correct (newest) keyframe payloads, and candidates whose slot is
    overwritten by the same batch's inserts are dropped, not verified
    against the wrong landmarks."""
    from omniswarm_tpu.swarm.loop_detector import LoopDetector

    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, size=(40, 3)).astype(np.float32)
    pts[:, 0] += 4.0
    ldesc = _scene_descs(rng)
    g = _gdesc(rng)
    p = FrontendParams(min_loop_matches=15, homography_prefilter=False,
                      verify_batch=True, max_db_size=3,
                      netvlad_thres=0.3, match_index_dist=1)
    det = LoopDetector(0, p, global_dim=64, seed=4)
    # 6 keyframes of the same place through a size-3 ring: every insert
    # after the third overwrites a slot
    accepted = []
    for f in range(6):
        noise = rng.normal(0, 0.01, size=pts.shape).astype(np.float32)
        kf = _make_kf(0, f, float(f), [0.02 * f, 0, 0, 0], pts + noise,
                      _gdesc(g + 0.005 * f), ldesc)
        accepted.append(det.on_keyframes_batch([kf])[0])
    # revisits must still verify after the wrap (slots hold live payloads)
    assert any(len(a) > 0 for a in accepted[3:])
    for a in accepted:
        for cand in a:
            # each accepted loop's dpose reflects the true tiny motion
            assert abs(float(cand.edge.dpose[0])) < 0.3
