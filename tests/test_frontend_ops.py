"""Frontend ops: NMS/top-K, descriptor sampling, matching, DB, PnP, triangulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.ops import keypoints as kp
from omniswarm_tpu.ops.matching import mutual_match
from omniswarm_tpu.ops import placedb
from omniswarm_tpu.ops.ransac import pnp_ransac_4dof
from omniswarm_tpu.ops.triangulation import triangulate_rays, triangulate_stereo


# ---------------- keypoints ----------------

def test_grid_nms_keeps_isolated_peaks():
    heat = np.zeros((32, 32), np.float32)
    heat[5, 5] = 1.0
    heat[5, 7] = 0.8    # within radius 4 of (5,5) → suppressed
    heat[20, 20] = 0.9
    out = np.asarray(kp.grid_nms(jnp.asarray(heat), nms_dist=4))
    assert out[5, 5] == 1.0
    assert out[5, 7] == 0.0
    assert out[20, 20] == 0.9


def test_extract_keypoints_topk_and_mask():
    heat = np.zeros((64, 96), np.float32)
    peaks = [(10, 20, 0.9), (40, 70, 0.8), (30, 5, 0.7)]
    for y, x, v in peaks:
        heat[y, x] = v
    xy, scores, valid = kp.extract_keypoints(
        jnp.asarray(heat), max_keypoints=8, threshold=0.1, nms_dist=4)
    xy, scores, valid = map(np.asarray, (xy, scores, valid))
    assert valid.sum() == 3
    got = {(int(x), int(y)) for (x, y), v in zip(xy, valid) if v}
    assert got == {(20, 10), (70, 40), (5, 30)}
    assert scores[0] == pytest.approx(0.9)


def test_bilinear_sample_exact_at_cell_centers():
    # descriptor map with distinctive values; sampling at coarse-cell centers
    # (pixel = 8*i + 3.5) must return the cell value exactly.
    Hc, Wc, C = 4, 5, 8
    rng = np.random.default_rng(0)
    dmap = rng.normal(size=(Hc, Wc, C)).astype(np.float32)
    xs, ys = 2, 3
    px = xs * 8 + 3.5, ys * 8 + 3.5
    xy = jnp.asarray([[xs * 8 + 3.5, ys * 8 + 3.5]], jnp.float32)
    out = np.asarray(kp.bilinear_sample_descriptors(jnp.asarray(dmap), xy))
    np.testing.assert_allclose(out[0], dmap[ys, xs], atol=1e-5)


# ---------------- matching ----------------

def test_mutual_match_recovers_permutation(rng):
    K, C = 32, 64
    desc_a = rng.normal(size=(K, C)).astype(np.float32)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    perm = rng.permutation(K)
    desc_b = desc_a[perm] + rng.normal(size=(K, C)).astype(np.float32) * 0.05
    desc_b /= np.linalg.norm(desc_b, axis=1, keepdims=True)
    valid = jnp.ones(K, bool)
    m = mutual_match(jnp.asarray(desc_a), jnp.asarray(desc_b), valid, valid,
                     min_similarity=0.5)
    idx_b = np.asarray(m.idx_b)
    mask = np.asarray(m.mask)
    assert mask.sum() >= K - 2
    # matched pairs must invert the permutation
    inv = np.argsort(perm)
    assert (idx_b[mask] == inv[mask]).mean() > 0.95


def test_mutual_match_masks_invalid(rng):
    desc = rng.normal(size=(8, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    va = jnp.asarray([True] * 4 + [False] * 4)
    m = mutual_match(jnp.asarray(desc), jnp.asarray(desc), va, va)
    assert not np.asarray(m.mask)[4:].any()


# ---------------- place DB ----------------

def test_placedb_add_query(rng):
    D = 64
    db = placedb.make_placedb(16, D)
    descs = rng.normal(size=(5, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    for i in range(5):
        db = placedb.add(db, jnp.asarray(descs[i]), jnp.asarray(0),
                         jnp.asarray(i))
    # query with a near-copy of entry 2, far enough in sequence
    q = descs[2] + rng.normal(size=D).astype(np.float32) * 0.01
    q /= np.linalg.norm(q)
    idx, sim = placedb.query(db, jnp.asarray(q), jnp.asarray(0),
                             jnp.asarray(30), match_index_dist=10)
    assert int(idx) == 2
    assert float(sim) > 0.9
    # recency guard: same query at frame 3 must NOT return nearby entries
    idx2, sim2 = placedb.query(db, jnp.asarray(q), jnp.asarray(0),
                               jnp.asarray(3), match_index_dist=10)
    assert float(sim2) == -np.inf or int(idx2) != 2


def test_placedb_remote_entries_not_recency_masked(rng):
    D = 32
    db = placedb.make_placedb(8, D)
    v = rng.normal(size=D).astype(np.float32)
    v /= np.linalg.norm(v)
    db = placedb.add(db, jnp.asarray(v), jnp.asarray(1), jnp.asarray(5))
    idx, sim = placedb.query(db, jnp.asarray(v), jnp.asarray(0),
                             jnp.asarray(5), match_index_dist=10)
    assert int(idx) == 0 and float(sim) > 0.99


# ---------------- PnP RANSAC ----------------

def wrap(a):
    return a - 2 * np.pi * np.floor((a + np.pi) / (2 * np.pi))


def make_pnp_problem(rng, K=64, yaw=0.7, t=(1.0, -2.0, 0.5),
                     outlier_frac=0.0, noise=0.0):
    pts = rng.uniform(-4, 4, size=(K, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1, 6, size=K)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    w = pts @ R.T + np.asarray(t, np.float32)
    bear = w / np.linalg.norm(w, axis=1, keepdims=True)
    n_out = int(outlier_frac * K)
    if n_out:
        bad = rng.normal(size=(n_out, 3)).astype(np.float32)
        bear[:n_out] = bad / np.linalg.norm(bad, axis=1, keepdims=True)
    if noise:
        bear += rng.normal(0, noise, size=bear.shape).astype(np.float32)
        bear /= np.linalg.norm(bear, axis=1, keepdims=True)
    return pts, bear


def test_pnp_exact():
    rng = np.random.default_rng(3)
    pts, bear = make_pnp_problem(rng)
    res = pnp_ransac_4dof(jnp.asarray(pts), jnp.asarray(bear),
                          jnp.ones(len(pts), bool), jax.random.PRNGKey(0))
    assert int(res.num_inliers) >= 60
    np.testing.assert_allclose(float(res.dpose[3]), 0.7, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.dpose[:3]), [1.0, -2.0, 0.5],
                               atol=1e-2)


def test_pnp_with_outliers_and_noise():
    rng = np.random.default_rng(4)
    pts, bear = make_pnp_problem(rng, K=96, outlier_frac=0.3, noise=0.005)
    res = pnp_ransac_4dof(jnp.asarray(pts), jnp.asarray(bear),
                          jnp.ones(len(pts), bool), jax.random.PRNGKey(1))
    assert int(res.num_inliers) >= 50
    assert abs(wrap(float(res.dpose[3]) - 0.7)) < 0.02
    np.testing.assert_allclose(np.asarray(res.dpose[:3]), [1.0, -2.0, 0.5],
                               atol=0.1)
    # outliers mostly excluded
    assert np.asarray(res.inliers)[:20].sum() <= 3


# ---------------- triangulation ----------------

def test_triangulate_rays_exact(rng):
    K = 32
    pts = rng.uniform(-3, 3, size=(K, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2, 8, size=K)
    o_a = np.zeros((K, 3), np.float32)
    o_b = np.tile([[0.3, 0.0, 0.0]], (K, 1)).astype(np.float32)
    d_a = pts - o_a
    d_a /= np.linalg.norm(d_a, axis=1, keepdims=True)
    d_b = pts - o_b
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
    est, err = triangulate_rays(*map(jnp.asarray, (o_a, d_a, o_b, d_b)))
    # f32 and a short 0.3 m baseline: mm-level agreement expected
    np.testing.assert_allclose(np.asarray(est), pts, atol=5e-3)
    assert float(jnp.max(err)) < 5e-3


def test_triangulate_stereo(rng):
    K = 16
    pts = rng.uniform(-2, 2, size=(K, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1, 5, size=K)
    bl = 0.12
    d_l = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    pr = pts - [bl, 0, 0]
    d_r = pr / np.linalg.norm(pr, axis=1, keepdims=True)
    est, err = triangulate_stereo(jnp.asarray(d_l), jnp.asarray(d_r), bl)
    np.testing.assert_allclose(np.asarray(est), pts, atol=1e-2)
