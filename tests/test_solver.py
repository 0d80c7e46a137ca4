"""LM solver convergence tests on canned graphs."""
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.core import geometry as geo
from omniswarm_tpu.solver import (
    GraphBuilder,
    diag_sqrt_info,
    lm_solve,
    lm_solve_multi_init,
    total_cost,
)


def circle_pose(t, radius=3.0, omega=0.5, phase=0.0, z=1.0):
    ang = omega * t + phase
    return np.array([radius * np.cos(ang), radius * np.sin(ang), z,
                     np_wrap(ang + np.pi / 2)])


def np_wrap(a):
    return a - 2 * np.pi * np.floor((a + np.pi) / (2 * np.pi))


def np_delta(a, b):
    c, s = np.cos(-a[3]), np.sin(-a[3])
    d = b[:3] - a[:3]
    return np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2],
                     np_wrap(b[3] - a[3])])


def build_single_drone_chain(F=10, noise=0.0, rng=None):
    """Odometry chain for one drone; first pose gauge-fixed."""
    b = GraphBuilder(F, 1, max_ranges=16, max_odoms=64, max_loops=16, max_dets=16)
    gt = np.stack([circle_pose(i * 0.5) for i in range(F)])
    sq = diag_sqrt_info(0.05, 0.02)
    for i in range(F):
        b.set_pose_valid(i, 0, fixed=(i == 0))
    for i in range(F - 1):
        dp = np_delta(gt[i], gt[i + 1])
        if noise and rng is not None:
            dp = dp + rng.normal(size=4) * noise
        b.add_odom(0, i, i + 1, dp, sq)
    return b.build(), gt


def test_single_drone_chain_exact():
    graph, gt = build_single_drone_chain(F=10)
    # init: all poses at the (correct) first pose → big initial error
    init = jnp.asarray(np.tile(gt[0], (10, 1, 1)), jnp.float32)
    res = lm_solve(graph, init, max_iterations=50)
    est = np.asarray(res.poses[:, 0, :])
    assert float(res.cost) < 1e-3, float(res.cost)
    np.testing.assert_allclose(est[:, :3], gt[:, :3], atol=1e-2)
    np.testing.assert_allclose(np.cos(est[:, 3]), np.cos(gt[:, 3]), atol=1e-3)


def build_two_drone_ranges(F=12, rng=None, outlier_loop=False):
    """Drone 0 fully fixed (anchor), drone 1 via odom chain + UWB ranges."""
    b = GraphBuilder(F, 2, max_ranges=64, max_odoms=64, max_loops=16, max_dets=16)
    gt = np.zeros((F, 2, 4))
    for i in range(F):
        gt[i, 0] = circle_pose(i * 0.7, radius=2.0, phase=0.0)
        gt[i, 1] = circle_pose(i * 0.7, radius=3.5, phase=2.0, z=2.0)
        b.set_pose_valid(i, 0, fixed=True)
        b.set_pose_valid(i, 1)
        d = np.linalg.norm(gt[i, 0, :3] - gt[i, 1, :3])
        b.add_range(i, 0, 1, d, cov=0.02)
    sq = diag_sqrt_info(0.05, 0.02)
    for i in range(F - 1):
        b.add_odom(1, i, i + 1, np_delta(gt[i, 1], gt[i + 1, 1]), sq)
    # one loop edge pinning yaw/position of drone 1 relative to drone 0
    loop_sq = diag_sqrt_info(0.1, 0.05)
    b.add_loop(0, 0, 0, 1, np_delta(gt[0, 0], gt[0, 1]), loop_sq)
    if outlier_loop:
        bad = np_delta(gt[5, 0], gt[5, 1]) + np.array([5.0, -4.0, 2.0, 1.5])
        b.add_loop(5, 0, 5, 1, bad, loop_sq)
    return b.build(), gt


def test_two_drone_range_fusion(rng):
    graph, gt = build_two_drone_ranges(F=12)
    init = np.array(gt, np.float32)
    # Perturb drone 1 significantly
    init[:, 1, :3] += rng.normal(size=(12, 3)) * 0.5
    init[:, 1, 3] += rng.normal(size=12) * 0.2
    res = lm_solve(graph, jnp.asarray(init), max_iterations=80)
    est = np.asarray(res.poses)
    err = np.linalg.norm(est[:, 1, :3] - gt[:, 1, :3], axis=1)
    assert err.max() < 0.05, (err.max(), float(res.cost))


def test_huber_rejects_outlier_loop(rng):
    graph, gt = build_two_drone_ranges(F=12, outlier_loop=True)
    init = np.array(gt, np.float32)
    init[:, 1, :3] += rng.normal(size=(12, 3)) * 0.3
    res = lm_solve(graph, jnp.asarray(init), max_iterations=80)
    est = np.asarray(res.poses)
    err = np.linalg.norm(est[:, 1, :3] - gt[:, 1, :3], axis=1)
    # Non-robust solve (huge delta disables the Huber loss) for comparison.
    res_nr = lm_solve(graph, jnp.asarray(init), max_iterations=80,
                      huber_delta=1e6)
    err_nr = np.linalg.norm(
        np.asarray(res_nr.poses)[:, 1, :3] - gt[:, 1, :3], axis=1)
    # Huber bounds the outlier's pull (hard rejection is PCM's job);
    # it must clearly beat the non-robust solve and stay sub-0.3 m.
    assert err.max() < 0.3, err.max()
    assert err.max() < 0.5 * err_nr.max(), (err.max(), err_nr.max())


def test_multi_init_recovers_from_bad_starts(rng):
    graph, gt = build_two_drone_ranges(F=12)
    B = 4
    inits = np.tile(np.asarray(gt, np.float32), (B, 1, 1, 1))
    # 3 bad random inits + 1 near-truth
    for k in range(B - 1):
        inits[k, :, 1, :3] = rng.normal(size=(12, 3)) * 4.0
        inits[k, :, 1, 3] = rng.uniform(-3, 3, size=12)
    inits[B - 1, :, 1, :3] += rng.normal(size=(12, 3)) * 0.2
    res = lm_solve_multi_init(graph, jnp.asarray(inits), max_iterations=80)
    est = np.asarray(res.poses)
    err = np.linalg.norm(est[:, 1, :3] - gt[:, 1, :3], axis=1)
    assert err.max() < 0.1, (err.max(), float(res.cost))


def test_cost_zero_at_ground_truth():
    graph, gt = build_single_drone_chain(F=8)
    cost = total_cost(graph, jnp.asarray(gt[:, None, :], jnp.float32))
    assert float(cost) < 1e-6


def test_fixed_poses_do_not_move(rng):
    graph, gt = build_two_drone_ranges(F=6)
    init = np.asarray(gt, np.float32).copy()
    init[:, 1, :3] += rng.normal(size=(6, 3)) * 0.3
    res = lm_solve(graph, jnp.asarray(init), max_iterations=30)
    np.testing.assert_allclose(np.asarray(res.poses[:, 0, :]), gt[:, 0, :], atol=1e-6)


def test_invalid_poses_untouched(rng):
    graph, gt = build_single_drone_chain(F=10)
    # invalidate nothing extra, but the builder's D=1 grid has only drone 0.
    init = jnp.asarray(np.tile(gt[0], (10, 1, 1)), jnp.float32)
    res = lm_solve(graph, init, max_iterations=50)
    assert np.all(np.isfinite(np.asarray(res.poses)))
