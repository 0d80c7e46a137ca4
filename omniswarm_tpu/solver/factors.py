"""Residual functions for the 4-DoF swarm factor graph.

Re-derivations (not translations) of the reference's Ceres autodiff functors
(/root/reference/swarm_localization/include/swarm_localization/swarm_localization_factors.hpp):

- ``range_residual``     ↔ DistanceMeasurementFactor (:203-224, residual dim 1)
- ``relpose_residual``   ↔ RelativePoseFactor4d (:226-271, dim 4; used for
  ego-motion chains, loop edges, and 4d/6d detections alike)
- ``detection_residual`` ↔ DroneDetection4dFactor (:273-367, dim 2 bearing +
  optional inv-depth, via unit_position_error* :74-103)

All functions take two 4-DoF poses ``[x, y, z, yaw]`` plus measurement
constants and return a fixed-size whitened residual. They are written to be
``vmap``-ed over factor batches and differentiated with ``jacfwd`` — each
factor touches at most 2 poses, so Jacobians are (m, 4) blocks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omniswarm_tpu.core import geometry as geo

RANGE_DIM = 1
RELPOSE_DIM = 4
DET_DIM = 3  # 2 tangent-plane + 1 inv-depth (masked when depth disabled)


def range_residual(
    pose_a: jnp.ndarray,
    pose_b: jnp.ndarray,
    distance: jnp.ndarray,
    sqrt_inf: jnp.ndarray,
) -> jnp.ndarray:
    """Whitened UWB range residual, shape (1,).

    (||p_a - p_b|| - d) * sqrt_inf, guarded against the zero-distance
    non-differentiability with a tiny epsilon.
    """
    diff = pose_a[:3] - pose_b[:3]
    dist_est = jnp.sqrt(jnp.sum(diff * diff) + 1e-12)
    return ((dist_est - distance) * sqrt_inf)[None]


def range_residual_antenna(
    pose_a: jnp.ndarray,
    pose_b: jnp.ndarray,
    distance: jnp.ndarray,
    sqrt_inf: jnp.ndarray,
    ant_a: jnp.ndarray,
    ant_b: jnp.ndarray,
) -> jnp.ndarray:
    """Range residual between body-frame UWB antenna points, shape (1,).

    The reference loads per-drone ``anntena_pos`` from swarm_nodes5.yaml
    (swarm_localization_node.cpp:300-328) and ranges between antenna
    phase centers, not body origins: the measured point is
    t + R(yaw) @ ant. Couples range measurements into yaw.
    """
    pa = pose_a[:3] + geo.yaw_rotate(pose_a[3], ant_a)
    pb = pose_b[:3] + geo.yaw_rotate(pose_b[3], ant_b)
    diff = pa - pb
    dist_est = jnp.sqrt(jnp.sum(diff * diff) + 1e-12)
    return ((dist_est - distance) * sqrt_inf)[None]


def relpose_residual(
    pose_a: jnp.ndarray,
    pose_b: jnp.ndarray,
    dpose_meas: jnp.ndarray,
    sqrt_info: jnp.ndarray,
) -> jnp.ndarray:
    """Whitened 4-DoF relative-pose residual, shape (4,).

    est = a^-1 ∘ b; residual = sqrt_info @ wrap(meas - est).
    """
    est = geo.delta_pose(pose_a, pose_b)
    err = dpose_meas - est
    err = err.at[3].set(geo.normalize_angle(err[3]))
    return sqrt_info @ err


def detection_residual(
    pose_a: jnp.ndarray,
    pose_b: jnp.ndarray,
    direction: jnp.ndarray,    # (3,) unit bearing of b seen from a's camera
    tangent_base: jnp.ndarray,  # (2, 3)
    inv_dep: jnp.ndarray,       # () measured inverse depth
    dpose_a: jnp.ndarray,       # (4,) camera extrinsic/self-motion correction a
    dpose_b: jnp.ndarray,       # (4,) correction b
    enable_depth: jnp.ndarray,  # () bool/float mask for the depth component
    sphere_std: float,
    inv_dep_std: float,
) -> jnp.ndarray:
    """Whitened bearing(+inverse-depth) residual, shape (3,).

    relpose_est = translation of (a∘dpose_a)^-1 ∘ (b∘dpose_b); the bearing
    error is the tangent-plane projection of (unit(relpose_est) - dir), and
    the optional third component is (inv_dep_meas - 1/||relpose_est||).
    """
    pa = geo.pose_mul(pose_a, dpose_a)
    pb = geo.pose_mul(pose_b, dpose_b)
    rel = geo.delta_pose_trans(pa, pb)
    norm = jnp.sqrt(jnp.sum(rel * rel) + 1e-12)
    unit = rel / norm
    err3 = unit - direction
    bearing = (tangent_base @ err3) / sphere_std
    depth_err = (inv_dep - 1.0 / norm) / inv_dep_std
    depth_err = depth_err * enable_depth.astype(bearing.dtype)
    return jnp.concatenate([bearing, depth_err[None]])


# --------------------------------------------------------------------------
# Batched residual+Jacobian evaluation.
# --------------------------------------------------------------------------

class FactorEval(NamedTuple):
    residual: jnp.ndarray  # (K, m)
    jac_a: jnp.ndarray     # (K, m, 4)
    jac_b: jnp.ndarray     # (K, m, 4)


def _with_jac(fn):
    """Wrap a residual fn(pose_a, pose_b, *consts) with its pose Jacobians."""

    def eval_one(pose_a, pose_b, *consts):
        r = fn(pose_a, pose_b, *consts)
        ja, jb = jax.jacfwd(fn, argnums=(0, 1))(pose_a, pose_b, *consts)
        return FactorEval(r, ja, jb)

    return eval_one


range_eval = jax.vmap(_with_jac(range_residual), in_axes=(0, 0, 0, 0))
range_eval_antenna = jax.vmap(_with_jac(range_residual_antenna),
                              in_axes=(0,) * 6)
relpose_eval = jax.vmap(_with_jac(relpose_residual), in_axes=(0, 0, 0, 0))


def make_detection_eval(sphere_std: float, inv_dep_std: float):
    def det_fn(pose_a, pose_b, direction, tangent_base, inv_dep, dpose_a,
               dpose_b, enable_depth):
        return detection_residual(
            pose_a, pose_b, direction, tangent_base, inv_dep, dpose_a,
            dpose_b, enable_depth, sphere_std, inv_dep_std,
        )

    return jax.vmap(_with_jac(det_fn), in_axes=(0,) * 8)


def huber_weight(residual: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS sqrt-weight for Ceres HuberLoss(delta) on whitened residual rows.

    Ceres applies rho to s = ||r||^2: rho'(s) = 1 if s <= delta^2 else
    delta/||r||; scaling r and J by sqrt(rho') reproduces the robustified
    normal equations (Triggs correction omitted, like Ceres' default for
    positive curvature). Reference attaches HuberLoss(1.0) to range, loop,
    and detection blocks (solver.cpp:1077-1096).
    """
    norm = jnp.linalg.norm(residual, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))
    return w


def huber_rho(sq_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Ceres HuberLoss rho(s): s if s<=delta^2 else 2*delta*sqrt(s)-delta^2."""
    d2 = delta * delta
    return jnp.where(
        sq_norm <= d2, sq_norm, 2.0 * delta * jnp.sqrt(jnp.maximum(sq_norm, 0.0)) - d2
    )
