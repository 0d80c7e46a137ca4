"""Property tests for pose4/pose6 geometry vs closed-form numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.core import geometry as geo


def random_poses(rng, n):
    pos = rng.normal(size=(n, 3)) * 10
    yaw = rng.uniform(-np.pi, np.pi, size=(n, 1))
    return jnp.asarray(np.concatenate([pos, yaw], axis=1), dtype=jnp.float32)


def test_normalize_angle_range(rng):
    theta = jnp.asarray(rng.uniform(-50, 50, size=1024), dtype=jnp.float32)
    wrapped = geo.normalize_angle(theta)
    assert np.all(np.asarray(wrapped) >= -np.pi - 1e-5)
    assert np.all(np.asarray(wrapped) < np.pi + 1e-5)
    # Wrapping preserves the angle modulo 2pi
    np.testing.assert_allclose(
        np.cos(np.asarray(theta)), np.cos(np.asarray(wrapped)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.sin(np.asarray(theta)), np.sin(np.asarray(wrapped)), atol=1e-4
    )


def test_pose_mul_inverse_roundtrip(rng):
    a = random_poses(rng, 256)
    ident = geo.pose_mul(a, geo.pose_inv(a))
    np.testing.assert_allclose(np.asarray(ident[:, :3]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ident[:, 3]), 0.0, atol=1e-5)


def test_delta_pose_definition(rng):
    a, b = random_poses(rng, 256), random_poses(rng, 256)
    d = geo.delta_pose(a, b)
    # a ∘ (a^-1 b) == b
    recon = geo.pose_mul(a, d)
    np.testing.assert_allclose(np.asarray(recon[:, :3]), np.asarray(b[:, :3]), atol=1e-3)
    np.testing.assert_allclose(
        np.cos(np.asarray(recon[:, 3])), np.cos(np.asarray(b[:, 3])), atol=1e-5
    )
    # And it matches pose_inv(a) ∘ b
    d2 = geo.pose_mul(geo.pose_inv(a), b)
    np.testing.assert_allclose(np.asarray(d[:, :3]), np.asarray(d2[:, :3]), atol=1e-3)


def test_transform_point_roundtrip(rng):
    pose = random_poses(rng, 128)
    pts = jnp.asarray(rng.normal(size=(128, 3)), dtype=jnp.float32)
    world = geo.transform_point(pose, pts)
    body = geo.inverse_transform_point(pose, world)
    np.testing.assert_allclose(np.asarray(body), np.asarray(pts), atol=1e-4)


def test_yaw_rotate_matches_matrix(rng):
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, size=64), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    out = np.asarray(geo.yaw_rotate(yaw, v))
    for i in range(64):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(out[i], R @ np.asarray(v[i]), atol=1e-4)


def test_quat_yaw_roundtrip(rng):
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, size=256), dtype=jnp.float32)
    q = geo.quat_from_yaw(yaw)
    np.testing.assert_allclose(np.asarray(geo.yaw_from_quat(q)), np.asarray(yaw), atol=1e-5)


def test_quat_rotate_matches_yaw_rotate(rng):
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, size=64), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    q = geo.quat_from_yaw(yaw)
    np.testing.assert_allclose(
        np.asarray(geo.quat_rotate(q, v)), np.asarray(geo.yaw_rotate(yaw, v)), atol=1e-4
    )


def test_quat_mul_associative_with_rotation(rng):
    def rand_quat(n):
        q = rng.normal(size=(n, 4))
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True), jnp.float32)

    q1, q2 = rand_quat(32), rand_quat(32)
    v = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    lhs = geo.quat_rotate(geo.quat_mul(q1, q2), v)
    rhs = geo.quat_rotate(q1, geo.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_tangent_base_orthogonal(rng):
    d = rng.normal(size=(128, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tb = geo.tangent_base_from_unit(d)
    # Each row unit-norm and orthogonal to dir
    dots = np.asarray(jnp.einsum("nkj,nj->nk", tb, d))
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)
    norms = np.asarray(jnp.linalg.norm(tb, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_tangent_base_near_vertical():
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], dtype=jnp.float32)
    tb = geo.tangent_base_from_unit(d)
    assert np.all(np.isfinite(np.asarray(tb)))


def test_geometry_jit_and_vmap(rng):
    a, b = random_poses(rng, 16), random_poses(rng, 16)
    f = jax.jit(jax.vmap(geo.delta_pose))
    np.testing.assert_allclose(
        np.asarray(f(a, b)), np.asarray(geo.delta_pose(a, b)), atol=1e-6
    )


def test_pose_error_4d_whitening(rng):
    est, meas = random_poses(rng, 8), random_poses(rng, 8)
    sqrt_info = jnp.eye(4, dtype=jnp.float32) * 2.0
    err = geo.pose_error_4d(est, meas, sqrt_info)
    raw = np.array(meas - est)
    raw[:, 3] = np.asarray(geo.normalize_angle(jnp.asarray(raw[:, 3])))
    np.testing.assert_allclose(np.asarray(err), 2.0 * raw, atol=1e-4)
