"""Batched homography RANSAC — the geometric match pre-filter.

The reference filters every candidate image-pair's descriptor matches with
cv::findHomography(old_2d, new_2d, CV_RANSAC, 3, mask) before pose solving
(loop_detector.cpp:539-624, USE_FUNDMENTAL branch): raw mutual-NN matches on
self-similar imagery carry outlier fractions that break PnP.

TPU-native version: a fixed batch of 4-point DLT hypotheses solved by one
batched 8x8 linear solve (h33 = 1 gauge), scored by symmetric-free forward
transfer error in pixels — no data-dependent control flow, one jit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from omniswarm_tpu.core.precision import highp


class HomographyResult(NamedTuple):
    H: jnp.ndarray            # (3, 3) best homography (a -> b)
    inliers: jnp.ndarray      # (K,) bool
    num_inliers: jnp.ndarray  # () i32


def _dlt_rows(pa: jnp.ndarray, pb: jnp.ndarray):
    """Two DLT rows per correspondence with h33 fixed to 1.

    [x y 1 0 0 0 -x'x -x'y] h = x' ;  [0 0 0 x y 1 -y'x -y'y] h = y'
    """
    x, y = pa[..., 0], pa[..., 1]
    xp, yp = pb[..., 0], pb[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -xp * x, -xp * y], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -yp * x, -yp * y], -1)
    A = jnp.stack([r1, r2], -2).reshape(-1, 8)   # rows interleaved per point
    b = jnp.stack([xp, yp], -1).reshape(-1)
    return A, b


def _transfer_err(H: jnp.ndarray, pa: jnp.ndarray, pb: jnp.ndarray):
    """Forward transfer error |H pa - pb| in pixels, shape (..., K)."""
    ph = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], -1)
    q = ph @ H.T if H.ndim == 2 else jnp.einsum("...ij,...kj->...ki", H, ph)
    w = q[..., 2]
    safe = jnp.where(jnp.abs(w) > 1e-8, w, 1e-8)
    proj = q[..., :2] / safe[..., None]
    err = jnp.linalg.norm(proj - pb, axis=-1)
    return jnp.where(jnp.abs(w) > 1e-8, err, jnp.inf)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
@highp
def homography_ransac(
    pts_a: jnp.ndarray,       # (K, 2) pixel coords in image a
    pts_b: jnp.ndarray,       # (K, 2) pixel coords in image b
    valid: jnp.ndarray,       # (K,) bool
    key: jax.Array,
    *,
    num_hypotheses: int = 256,
    err_thresh: float = 3.0,  # pixels (cv::findHomography(..., 3, ...))
) -> HomographyResult:
    K = pts_a.shape[0]
    dtype = pts_a.dtype

    logits = jnp.where(valid, 0.0, -jnp.inf).astype(dtype)
    idx = jax.random.categorical(key, logits, shape=(num_hypotheses, 4))

    sa = pts_a[idx]                                  # (B, 4, 2)
    sb = pts_b[idx]

    # normalize for conditioning (scale to ~unit box around centroid)
    ca = jnp.mean(sa, axis=1, keepdims=True)
    cb = jnp.mean(sb, axis=1, keepdims=True)
    scale_a = jnp.maximum(jnp.mean(jnp.abs(sa - ca), axis=(1, 2)), 1e-3)
    scale_b = jnp.maximum(jnp.mean(jnp.abs(sb - cb), axis=(1, 2)), 1e-3)
    na = (sa - ca) / scale_a[:, None, None]
    nb = (sb - cb) / scale_b[:, None, None]

    A, b = jax.vmap(_dlt_rows)(na, nb)               # (B, 8, 8), (B, 8)
    # tiny ridge keeps degenerate (collinear) samples finite; they simply
    # lose the inlier vote
    AtA = jnp.einsum("bij,bik->bjk", A, A) + 1e-8 * jnp.eye(8, dtype=dtype)
    Atb = jnp.einsum("bij,bi->bj", A, b)
    h = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]  # (B, 8)
    Hn = jnp.concatenate([h, jnp.ones((num_hypotheses, 1), dtype)],
                         -1).reshape(-1, 3, 3)
    # denormalize: H = T_b^-1 Hn T_a
    def denorm(Hn, ca, sa_, cb, sb_):
        Ta = jnp.array([[1 / sa_, 0, -ca[0] / sa_],
                        [0, 1 / sa_, -ca[1] / sa_],
                        [0, 0, 1.0]], dtype)
        Tbinv = jnp.array([[sb_, 0, cb[0]],
                           [0, sb_, cb[1]],
                           [0, 0, 1.0]], dtype)
        return Tbinv @ Hn @ Ta

    H_all = jax.vmap(denorm)(Hn, ca[:, 0], scale_a, cb[:, 0], scale_b)

    err = jax.vmap(lambda H: _transfer_err(H, pts_a, pts_b))(H_all)  # (B, K)
    inl = (err < err_thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    Hb = H_all[best]

    # one least-squares refit on the best hypothesis' inliers
    w = inl[best].astype(dtype)
    Af, bf = _dlt_rows(pts_a, pts_b)                 # (2K, 8), (2K,)
    wf = jnp.repeat(w, 2)
    AtA = jnp.einsum("ij,ik->jk", Af * wf[:, None], Af) \
        + 1e-6 * jnp.eye(8, dtype=dtype)
    Atb = jnp.einsum("ij,i->j", Af * wf[:, None], bf)
    hf = jnp.linalg.solve(AtA, Atb)
    Hf = jnp.concatenate([hf, jnp.ones((1,), dtype)]).reshape(3, 3)
    err_f = _transfer_err(Hf, pts_a, pts_b)
    inl_f = (err_f < err_thresh) & valid
    use_f = (jnp.sum(inl_f) >= scores[best]) & jnp.all(jnp.isfinite(Hf))
    H_out = jnp.where(use_f, Hf, Hb)
    inliers = jnp.where(use_f, inl_f, inl[best])
    return HomographyResult(H=H_out, inliers=inliers,
                            num_inliers=jnp.sum(inliers).astype(jnp.int32))
