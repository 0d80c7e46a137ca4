"""PnP RANSAC robustness: high outlier fractions + near-planar scenes.

VERDICT r1 weak #6: the 4-point linear PnP had no test above 30% outliers
and no planar-degeneracy coverage (the wall world IS planar). These pin the
operating envelope of ops/ransac.pnp_ransac_4dof.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omniswarm_tpu.ops.ransac import pnp_ransac_4dof
from omniswarm_tpu.sim.simulator import wrap

K = 128


def make_problem(rng, *, outlier_frac, planar, yaw=0.3,
                 t=(0.5, -0.3, 0.2), noise=0.002):
    """Points in frame B; bearings of those points seen from frame A.

    A is B transformed by (t, yaw): p_A = R(yaw) p_B + t.
    """
    if planar:
        # points on a tilted plane (rank-deficient normal direction)
        y = rng.uniform(-2, 2, K)
        z = rng.uniform(-1, 1, K)
        x = 3.0 + 0.45 * y               # tilted wall, zero thickness
        pts = np.stack([x, y, z], 1)
    else:
        pts = np.stack([rng.uniform(2, 5, K), rng.uniform(-2, 2, K),
                        rng.uniform(-1.5, 1.5, K)], 1)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    pa = pts @ R.T + np.asarray(t)
    bearings = pa / np.linalg.norm(pa, axis=1, keepdims=True)
    bearings = bearings + rng.normal(0, noise, bearings.shape)
    bearings /= np.linalg.norm(bearings, axis=1, keepdims=True)
    n_out = int(outlier_frac * K)
    idx = rng.permutation(K)[:n_out]
    rnd = rng.normal(size=(n_out, 3))
    bearings[idx] = rnd / np.linalg.norm(rnd, axis=1, keepdims=True)
    return (jnp.asarray(pts, jnp.float32), jnp.asarray(bearings, jnp.float32),
            np.asarray(t + (yaw,), np.float32), idx)


@pytest.mark.parametrize("outlier_frac", [0.3, 0.45, 0.6])
def test_pnp_high_outlier_fraction(outlier_frac, rng):
    pts, bearings, gt, out_idx = make_problem(
        rng, outlier_frac=outlier_frac, planar=False)
    res = pnp_ransac_4dof(pts, bearings, jnp.ones(K, bool),
                          jax.random.PRNGKey(0), err_thresh=0.01,
                          num_hypotheses=512)
    d = np.asarray(res.dpose)
    assert np.linalg.norm(d[:3] - gt[:3]) < 0.05, (d, gt)
    assert abs(wrap(d[3] - gt[3])) < 0.02
    # the inlier set excludes the planted outliers
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.05


def test_pnp_planar_scene_stays_accurate(rng):
    """Zero-thickness planar landmark set (wall world) must not collapse."""
    pts, bearings, gt, _ = make_problem(rng, outlier_frac=0.2, planar=True)
    res = pnp_ransac_4dof(pts, bearings, jnp.ones(K, bool),
                          jax.random.PRNGKey(1), err_thresh=0.01,
                          num_hypotheses=512)
    d = np.asarray(res.dpose)
    assert np.linalg.norm(d[:3] - gt[:3]) < 0.08, (d, gt)
    assert abs(wrap(d[3] - gt[3])) < 0.03


def test_pnp_planar_multiple_seeds(rng):
    """Planar + moderate outliers across RNG seeds: bounded worst case."""
    errs = []
    for seed in range(6):
        r2 = np.random.default_rng(100 + seed)
        pts, bearings, gt, _ = make_problem(r2, outlier_frac=0.3,
                                            planar=True)
        res = pnp_ransac_4dof(pts, bearings, jnp.ones(K, bool),
                              jax.random.PRNGKey(seed), err_thresh=0.01,
                              num_hypotheses=512)
        d = np.asarray(res.dpose)
        errs.append(float(np.linalg.norm(d[:3] - gt[:3])))
    assert np.median(errs) < 0.06, errs
    assert max(errs) < 0.15, errs
