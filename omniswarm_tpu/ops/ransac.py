"""Vmapped 4-DoF PnP RANSAC — the geometric-verification core of loop closure.

Replaces the reference's cv::solvePnPRansac + yaw-only restriction
(compute_relative_pose, loop_detector.cpp:355-413): instead of iterative
host-side RANSAC, H hypotheses are solved in parallel by a *linear* 4-DoF
minimal solver and scored against all correspondences in one batched pass.

Model: 3-D points p_k in keyframe B's (gravity-aligned) body frame observed
as unit bearings u_k in keyframe A's body frame; unknown 4-DoF transform
(t, yaw) with u_k ∥ R(yaw) p_k + t. The epipolar-style constraint
u × (R p + t) = 0 is linear in v = [cos yaw, sin yaw, tx, ty, tz], so each
hypothesis is a 5x5 normal-equation solve — no iteration, no branching.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from omniswarm_tpu.core.precision import highp


class PnPResult(NamedTuple):
    dpose: jnp.ndarray        # (4,) [tx, ty, tz, yaw]: B expressed in A
    inliers: jnp.ndarray      # (K,) bool
    num_inliers: jnp.ndarray  # () i32
    mean_err: jnp.ndarray     # () mean angular error (1 - cos) of inliers


def _constraint_rows(points: jnp.ndarray, bearings: jnp.ndarray):
    """Linear system rows A (K, 3, 5), b (K, 3) for u x (R p + t) = 0."""
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    ux, uy, uz = bearings[:, 0], bearings[:, 1], bearings[:, 2]
    zero = jnp.zeros_like(px)
    # rows: coefficients of [c, s, tx, ty, tz]; rhs moves constants right.
    a1 = jnp.stack([-uz * py, -uz * px, zero, -uz, uy], -1)
    b1 = -uy * pz
    a2 = jnp.stack([uz * px, -uz * py, uz, zero, -ux], -1)
    b2 = ux * pz
    a3 = jnp.stack([ux * py - uy * px, ux * px + uy * py, -uy, ux, zero], -1)
    b3 = zero
    A = jnp.stack([a1, a2, a3], axis=1)
    b = jnp.stack([b1, b2, b3], axis=1)
    return A, b


def _solve_weighted(A: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray):
    """Weighted LS for v=[c,s,tx,ty,tz]; A (K,3,5), b (K,3), w (K,)."""
    Aw = A * w[:, None, None]
    bw = b * w[:, None]
    Af = Aw.reshape(-1, 5)
    bf = bw.reshape(-1)
    AtA = Af.T @ Af + 1e-8 * jnp.eye(5, dtype=A.dtype)
    Atb = Af.T @ bf
    v = jnp.linalg.solve(AtA, Atb)
    # project (c, s) onto the unit circle → yaw; re-solve t given yaw for
    # consistency (linear in t).
    yaw = jnp.arctan2(v[1], v[0])
    return yaw, v[2:5]


def _refine_t(points, bearings, w, yaw):
    """Given yaw, least-squares t from u x (R p + t) = 0."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rp = jnp.stack([c * points[:, 0] - s * points[:, 1],
                    s * points[:, 0] + c * points[:, 1],
                    points[:, 2]], -1)
    u = bearings
    # u x (rp + t) = 0 → [u]_x t = -[u]_x rp
    zero = jnp.zeros_like(u[:, 0])
    ux_mat = jnp.stack([
        jnp.stack([zero, -u[:, 2], u[:, 1]], -1),
        jnp.stack([u[:, 2], zero, -u[:, 0]], -1),
        jnp.stack([-u[:, 1], u[:, 0], zero], -1),
    ], axis=1)                                           # (K, 3, 3)
    rhs = -jnp.einsum("kij,kj->ki", ux_mat, rp)
    Aw = ux_mat * w[:, None, None]
    bw = rhs * w[:, None]
    Af = Aw.reshape(-1, 3)
    bf = bw.reshape(-1)
    AtA = Af.T @ Af + 1e-8 * jnp.eye(3, dtype=points.dtype)
    return jnp.linalg.solve(AtA, Af.T @ bf)


def _score(points, bearings, valid, yaw, t, cos_thresh):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    w = jnp.stack([c * points[:, 0] - s * points[:, 1] + t[0],
                   s * points[:, 0] + c * points[:, 1] + t[1],
                   points[:, 2] + t[2]], -1)
    wn = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.sum(wn * bearings, axis=-1)
    inl = (cosang > cos_thresh) & valid
    return inl, cosang


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
@highp
def pnp_ransac_4dof(
    points: jnp.ndarray,      # (K, 3) in frame B
    bearings: jnp.ndarray,    # (K, 3) unit, in frame A
    valid: jnp.ndarray,       # (K,) bool
    key: jax.Array,
    *,
    num_hypotheses: int = 256,
    sample_size: int = 4,
    err_thresh: float = 0.03,  # radians (small-angle ≈ normalized-plane err)
) -> PnPResult:
    K = points.shape[0]
    cos_thresh = jnp.cos(err_thresh)
    dtype = points.dtype
    A, b = _constraint_rows(points, bearings)

    # Sample hypothesis index sets over the VALID correspondences only
    # (categorical with -inf logits on invalid rows; uniform-over-K sampling
    # collapses the clean-sample probability when valid entries are sparse,
    # e.g. merged multi-direction keyframes). Degenerate duplicate picks
    # just produce poor models that lose the inlier vote.
    logits = jnp.where(valid, 0.0, -jnp.inf).astype(dtype)
    idx = jax.random.categorical(
        key, logits, shape=(num_hypotheses, sample_size))

    def solve_hypothesis(sample_idx):
        w = jnp.zeros((K,), dtype).at[sample_idx].set(1.0) * valid.astype(dtype)
        yaw, _ = _solve_weighted(A, b, w)
        t = _refine_t(points, bearings, w, yaw)
        inl, _ = _score(points, bearings, valid, yaw, t, cos_thresh)
        return yaw, t, jnp.sum(inl)

    yaws, ts, scores = jax.vmap(solve_hypothesis)(idx)
    best = jnp.argmax(scores)
    yaw, t = yaws[best], ts[best]

    # Annealed inlier-weighted refinement (LO-RANSAC style): each round
    # re-fits on the inliers of a progressively TIGHTER threshold, so
    # borderline near-outliers admitted by the base gate stop biasing the
    # solution (measured ~2x pose-error reduction on planar scenes).
    for shrink in (1.0, 0.5, 0.25):
        thr = jnp.cos(err_thresh * shrink)
        inl_r, _ = _score(points, bearings, valid, yaw, t, thr)
        w = inl_r.astype(dtype)
        enough = jnp.sum(w) >= sample_size
        yaw2, _ = _solve_weighted(A, b, w)
        t2 = _refine_t(points, bearings, w, yaw2)
        # keep refinement only if it does not lose base-gate inliers
        inl_old, _ = _score(points, bearings, valid, yaw, t, cos_thresh)
        inl_new, _ = _score(points, bearings, valid, yaw2, t2, cos_thresh)
        better = enough & (jnp.sum(inl_new) >= jnp.sum(inl_old)) & \
            jnp.all(jnp.isfinite(t2)) & jnp.isfinite(yaw2)
        yaw = jnp.where(better, yaw2, yaw)
        t = jnp.where(better, t2, t)

    inliers, cosang = _score(points, bearings, valid, yaw, t, cos_thresh)
    n_inl = jnp.sum(inliers)
    mean_err = jnp.sum(jnp.where(inliers, 1.0 - cosang, 0.0)) / jnp.maximum(
        n_inl, 1)
    dpose = jnp.concatenate([t, yaw[None]])
    return PnPResult(dpose=dpose, inliers=inliers,
                     num_inliers=n_inl.astype(jnp.int32), mean_err=mean_err)
