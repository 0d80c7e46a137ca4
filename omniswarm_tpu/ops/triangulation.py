"""Batched two-view triangulation.

Replaces the reference's per-point SVD triangulation
(LoopCam::triangulatePoint, loop_cam.cpp:73-106) with a closed-form batched
midpoint solver: given K ray pairs (origin + unit direction in a common
frame) find the point minimizing the sum of squared distances to both rays.
One (K, 3, 3) solve — vmappable, MXU-sized.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def triangulate_rays(
    origins_a: jnp.ndarray, dirs_a: jnp.ndarray,
    origins_b: jnp.ndarray, dirs_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint triangulation of K ray pairs.

    All inputs (K, 3); directions unit. Returns (points (K, 3),
    error (K,) = RMS distance of the point to the two rays).
    """
    eye = jnp.eye(3, dtype=origins_a.dtype)

    def proj(d):
        return eye[None] - d[:, :, None] * d[:, None, :]   # (K, 3, 3)

    Pa, Pb = proj(dirs_a), proj(dirs_b)
    A = Pa + Pb
    rhs = jnp.einsum("kij,kj->ki", Pa, origins_a) + jnp.einsum(
        "kij,kj->ki", Pb, origins_b)
    A = A + 1e-9 * eye[None]
    pts = jnp.linalg.solve(A, rhs[..., None])[..., 0]

    def ray_dist(p, o, d):
        v = p - o
        perp = v - jnp.sum(v * d, -1, keepdims=True) * d
        return jnp.sum(perp * perp, -1)

    err = jnp.sqrt(0.5 * (ray_dist(pts, origins_a, dirs_a)
                          + ray_dist(pts, origins_b, dirs_b)))
    return pts, err


def triangulate_stereo(
    bearings_left: jnp.ndarray, bearings_right: jnp.ndarray,
    baseline: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stereo triangulation in the left-camera frame.

    bearings are unit rays in each camera frame; the right camera is
    translated +baseline along x (standard rectified stereo as in the
    reference's left/right fisheye pairs).
    """
    K = bearings_left.shape[0]
    o_a = jnp.zeros((K, 3), bearings_left.dtype)
    o_b = jnp.tile(jnp.asarray([[baseline, 0.0, 0.0]],
                               bearings_left.dtype), (K, 1))
    return triangulate_rays(o_a, bearings_left, o_b, bearings_right)
