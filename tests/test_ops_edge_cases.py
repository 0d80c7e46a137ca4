"""Edge cases for the frontend ops: degenerate inputs must not crash."""
import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.ops import placedb
from omniswarm_tpu.ops.matching import mutual_match
from omniswarm_tpu.ops.ransac import pnp_ransac_4dof
from omniswarm_tpu.ops.keypoints import extract_keypoints
from omniswarm_tpu.solver.block_tridiag import bt_solve


def test_pnp_too_few_points():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)),
                      jnp.float32)
    bear = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    valid = jnp.asarray([True, True] + [False] * 6)
    res = pnp_ransac_4dof(pts, bear, valid, jax.random.PRNGKey(0),
                          num_hypotheses=32)
    assert np.isfinite(np.asarray(res.dpose)).all()
    assert int(res.num_inliers) <= 2


def test_pnp_no_valid_points():
    pts = jnp.ones((8, 3), jnp.float32)
    bear = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    valid = jnp.zeros(8, bool)
    res = pnp_ransac_4dof(pts, bear, valid, jax.random.PRNGKey(0),
                          num_hypotheses=16)
    assert int(res.num_inliers) == 0
    assert np.isfinite(np.asarray(res.dpose)).all()


def test_mutual_match_all_invalid():
    d = jnp.ones((6, 16), jnp.float32)
    v = jnp.zeros(6, bool)
    m = mutual_match(d, d, v, v)
    assert not np.asarray(m.mask).any()


def test_placedb_query_empty():
    db = placedb.make_placedb(8, 16)
    idx, sim = placedb.query(db, jnp.ones(16), jnp.asarray(0),
                             jnp.asarray(0))
    assert float(sim) == -np.inf


def test_extract_keypoints_blank_image():
    heat = jnp.zeros((32, 64), jnp.float32)
    xy, scores, valid = extract_keypoints(heat, max_keypoints=16,
                                          threshold=0.1)
    assert not np.asarray(valid).any()


def test_bt_solve_single_frame():
    A = jnp.eye(8)[None] * 3.0
    B = jnp.zeros((0, 8, 8))
    rhs = jnp.ones((1, 8, 2))
    x = bt_solve(A, B, rhs)
    np.testing.assert_allclose(np.asarray(x), 1.0 / 3.0, atol=1e-5)


def test_empty_estimator_predict():
    from omniswarm_tpu.swarm import SwarmEstimator

    est = SwarmEstimator()
    assert est.predict(0, 0.0) is None
    assert est.predict_swarm(0.0) == {}
    assert est.pose_covariance(0) is None
    out = est.solve()
    assert not out["solved"]
