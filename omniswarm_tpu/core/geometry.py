"""4-DoF / 6-DoF pose geometry as broadcastable jnp operations.

The estimation state of the whole system is the 4-DoF pose
``[x, y, z, yaw]`` (roll/pitch are observable from VIO gravity alignment and
therefore marginalized out before the swarm problem — same parameterization as
the reference's Ceres factors, see
/root/reference/swarm_localization/include/swarm_localization/swarm_localization_factors.hpp:26-27).

Every function here is shape-polymorphic over leading batch dimensions and is
safe under ``jit`` / ``vmap`` / ``grad``: poses are plain ``jnp`` arrays of
shape ``(..., 4)``, quaternions ``(..., 4)`` in ``(w, x, y, z)`` order, and
points ``(..., 3)``.

Behavioral parity targets (math only, re-derived — not translated):
- ``normalize_angle``  ↔ factors.hpp:34-40
- ``yaw_rotate``       ↔ factors.hpp:122-127 (YawRotatePoint)
- ``delta_pose``       ↔ factors.hpp:139-149 (DeltaPose: a^-1 ∘ b)
- ``delta_pose_trans`` ↔ factors.hpp:152-160 (DeltaPose_Naive)
- ``pose_mul``         ↔ factors.hpp:163-172 (PoseMulti: a ∘ b)
- ``transform_point``  ↔ factors.hpp:129-135 (PoseTransformPoint)
- ``tangent_base_from_unit`` ↔ the detection tangent basis used by
  DroneDetection (swarm_msgs; standard VINS-Mono tangent basis construction)
"""
from __future__ import annotations

import math

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def normalize_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to [-pi, pi)."""
    return theta - TWO_PI * jnp.floor((theta + math.pi) / TWO_PI)


def yaw_rotate(yaw: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) about +z by yaw. vec: (..., 3), yaw: (...)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = c * vec[..., 0] - s * vec[..., 1]
    y = s * vec[..., 0] + c * vec[..., 1]
    z = jnp.broadcast_to(vec[..., 2], x.shape)
    return jnp.stack([x, y, z], axis=-1)


def pose_position(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., :3]


def pose_yaw(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., 3]


def make_pose(position: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    shape = jnp.broadcast_shapes(position.shape[:-1], yaw.shape)
    position = jnp.broadcast_to(position, shape + (3,))
    yaw = jnp.broadcast_to(yaw, shape)
    return jnp.concatenate([position, yaw[..., None]], axis=-1)


def pose_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose poses: a ∘ b (apply b in a's frame)."""
    t = yaw_rotate(a[..., 3], b[..., :3]) + a[..., :3]
    yaw = normalize_angle(a[..., 3] + b[..., 3])
    return make_pose(t, yaw)


def pose_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse pose: pose_mul(a, pose_inv(a)) == identity."""
    yaw = -a[..., 3]
    t = -yaw_rotate(yaw, a[..., :3])
    return make_pose(t, normalize_angle(yaw))


def delta_pose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose a^-1 ∘ b as a 4-vector with wrapped yaw."""
    dt = yaw_rotate(-a[..., 3], b[..., :3] - a[..., :3])
    dyaw = normalize_angle(b[..., 3] - a[..., 3])
    return make_pose(dt, dyaw)


def delta_pose_trans(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Translation-only relative position of b in a's frame, (..., 3)."""
    return yaw_rotate(-a[..., 3], b[..., :3] - a[..., :3])


def transform_point(pose: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Map point from pose's body frame into the world frame."""
    return yaw_rotate(pose[..., 3], point) + pose[..., :3]


def inverse_transform_point(pose: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Map a world-frame point into pose's body frame."""
    return yaw_rotate(-pose[..., 3], point - pose[..., :3])


# --------------------------------------------------------------------------
# Quaternions (w, x, y, z) — for ingesting 6-DoF VIO odometry.
# --------------------------------------------------------------------------

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * yaw
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Extract yaw (z of ZYX euler) from a unit quaternion."""
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def pose6_to_pose4(position: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Project a 6-DoF pose (position + quaternion) to [x, y, z, yaw]."""
    return make_pose(position, yaw_from_quat(quat))


# --------------------------------------------------------------------------
# Detection tangent basis and consistency metrics.
# --------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Numpy SE(3) helpers for host-side 6-DoF loop-edge re-anchoring
# (loop_from_src_loop_connection composes full-attitude VIO poses before the
# 4-DoF flatten, swarm_localization_solver.cpp:1464-1553).
# Pose6 layout: (..., 7) = [x, y, z, qw, qx, qy, qz].
# ---------------------------------------------------------------------------

def quat_mul_np(q1, q2):
    import numpy as np
    w1, x1, y1, z1 = (q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3])
    w2, x2, y2, z2 = (q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3])
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1)


def quat_conj_np(q):
    import numpy as np
    return q * np.asarray([1.0, -1.0, -1.0, -1.0])


def quat_rotate_np(q, v):
    import numpy as np
    w, xyz = q[..., :1], q[..., 1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def quat_from_rpy_np(roll, pitch, yaw):
    import numpy as np
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy], -1)


def yaw_from_quat_np(q):
    import numpy as np
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def se3_mul_np(a, b):
    """Compose (..., 7) pose6: a ∘ b."""
    import numpy as np
    t = a[..., :3] + quat_rotate_np(a[..., 3:], b[..., :3])
    q = quat_mul_np(a[..., 3:], b[..., 3:])
    return np.concatenate([t, q], -1)


def se3_inv_np(a):
    import numpy as np
    qc = quat_conj_np(a[..., 3:])
    return np.concatenate([-quat_rotate_np(qc, a[..., :3]), qc], -1)


def se3_delta_np(a, b):
    """a^-1 ∘ b for (..., 7) pose6."""
    return se3_mul_np(se3_inv_np(a), b)


def se3_to_pose4_np(a):
    """Flatten pose6 to [x, y, z, yaw]."""
    import numpy as np
    return np.concatenate([a[..., :3], yaw_from_quat_np(a[..., 3:])[..., None]],
                          -1)


def pose4_to_se3_np(p):
    import numpy as np
    p = np.asarray(p, float)
    return np.concatenate(
        [p[..., :3], quat_from_rpy_np(
            np.zeros_like(p[..., 3]), np.zeros_like(p[..., 3]),
            p[..., 3])], -1)


def tangent_base_from_unit_np(unit_dir):
    """Numpy twin of tangent_base_from_unit for host-side graph builders.

    Graph construction is host-side bookkeeping; dispatching it through the
    device (eagerly, over the remote-TPU tunnel) costs milliseconds to
    minutes. Shapes (..., 3) -> (..., 2, 3).
    """
    import numpy as np

    unit_dir = np.asarray(unit_dir, np.float32)
    near_z = np.abs(unit_dir[..., 2]) > 0.99
    helper = np.where(
        near_z[..., None],
        np.asarray([1.0, 0.0, 0.0], np.float32),
        np.asarray([0.0, 0.0, 1.0], np.float32))
    proj = np.sum(helper * unit_dir, axis=-1, keepdims=True)
    b1 = helper - unit_dir * proj
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = np.cross(unit_dir, b1)
    return np.stack([b1, b2], axis=-2)


def tangent_base_from_unit(unit_dir: jnp.ndarray) -> jnp.ndarray:
    """2x3 orthonormal basis of the tangent plane of a unit bearing vector.

    Rows b1, b2 are orthogonal to ``unit_dir``; detection residuals are
    projected onto this plane (VINS-style sphere manifold residual; cf. the
    ``tangent_base`` consumed at factors.hpp:74-103). Shape (..., 2, 3).
    """
    # Pick a helper axis not parallel to dir: z unless |dir_z| ~ 1.
    near_z = jnp.abs(unit_dir[..., 2]) > 0.99
    helper = jnp.where(
        near_z[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], unit_dir.dtype), unit_dir.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], unit_dir.dtype), unit_dir.shape),
    )
    proj = jnp.sum(helper * unit_dir, axis=-1, keepdims=True)
    b1 = helper - unit_dir * proj
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(unit_dir, b1)
    return jnp.stack([b1, b2], axis=-2)


def squared_mahalanobis(err: jnp.ndarray, cov_inv: jnp.ndarray) -> jnp.ndarray:
    """err^T Σ^-1 err over the last axis; cov_inv (..., D, D)."""
    return jnp.einsum("...i,...ij,...j->...", err, cov_inv, err)


def pose_error_4d(
    est: jnp.ndarray, meas: jnp.ndarray, sqrt_info: jnp.ndarray
) -> jnp.ndarray:
    """Whitened 4-vector pose error sqrt_info @ wrap(meas - est).

    Mirrors pose_error_4d at factors.hpp:52-61 (measurement minus estimate,
    yaw wrapped, left-multiplied by the 4x4 square-root information).
    """
    err = meas - est
    err = err.at[..., 3].set(normalize_angle(err[..., 3]))
    return jnp.einsum("...ij,...j->...i", sqrt_info, err)
