"""Tests for the fixed-capacity ring-buffer trajectory."""
import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.core import geometry as geo
from omniswarm_tpu.core import trajectory as trj


def build_line_traj(n=10, cap=16):
    traj = trj.make_trajectory(cap)

    def step(traj, i):
        pose = jnp.asarray([1.0, 0.0, 0.0, 0.0]) * i
        return trj.append(traj, i * 0.1, pose), None

    for i in range(n):
        traj, _ = step(traj, float(i))
    return traj


def test_append_and_count():
    traj = build_line_traj(10, 16)
    assert int(traj.count) == 10
    np.testing.assert_allclose(float(traj.cumlen[9]), 9.0, atol=1e-5)


def test_ring_overwrite():
    traj = build_line_traj(20, 16)
    assert int(traj.count) == 16
    # Slot 0..3 were overwritten by samples 16..19
    np.testing.assert_allclose(float(traj.pose[0, 0]), 16.0, atol=1e-5)
    # cumlen keeps accumulating across the wrap
    np.testing.assert_allclose(float(traj.cumlen[3]), 19.0, atol=1e-4)


def test_nearest_lookup():
    traj = build_line_traj(10, 16)
    idx = trj.nearest_index(traj, jnp.asarray(0.31))
    assert int(idx) == 3
    pose = trj.pose_at(traj, jnp.asarray(0.52))
    np.testing.assert_allclose(float(pose[0]), 5.0, atol=1e-5)


def test_length_between():
    traj = build_line_traj(10, 16)
    length = trj.length_between(traj, jnp.asarray(0.2), jnp.asarray(0.7))
    np.testing.assert_allclose(float(length), 5.0, atol=1e-4)


def test_relative_pose_between_matches_delta():
    traj = trj.make_trajectory(8)
    p0 = jnp.asarray([1.0, 2.0, 0.5, 0.3])
    p1 = jnp.asarray([2.0, 1.0, 0.7, -0.4])
    traj = trj.append(traj, 0.0, p0)
    traj = trj.append(traj, 1.0, p1)
    rel = trj.relative_pose_between(traj, jnp.asarray(0.0), jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.asarray(rel), np.asarray(geo.delta_pose(p0, p1)), atol=1e-5
    )


def test_drift_covariance_scales_with_length():
    traj = build_line_traj(10, 16)
    cov = trj.drift_covariance_between(traj, jnp.asarray(0.0), jnp.asarray(0.5),
                                       cov_pos_per_meter=0.002,
                                       cov_yaw_per_meter=1e-4)
    np.testing.assert_allclose(float(cov[0, 0]), 0.002 * 5.0, atol=1e-6)
    np.testing.assert_allclose(float(cov[3, 3]), 1e-4 * 5.0, atol=1e-8)


def test_append_jittable():
    traj = trj.make_trajectory(8)
    append_jit = jax.jit(trj.append)
    traj = append_jit(traj, jnp.asarray(0.0), jnp.asarray([0.0, 0.0, 0.0, 0.0]))
    traj = append_jit(traj, jnp.asarray(0.1), jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    assert int(traj.count) == 2
    np.testing.assert_allclose(float(traj.cumlen[1]), 1.0, atol=1e-5)
