"""Fixed-shape keypoint post-processing ops (NMS, top-K, descriptor sampling).

Replaces the reference's host-side OpenCV pipeline
(superpoint_tensorrt.cpp:164-309: threshold → findNonZero → NMS2 grid
suppression → partial-sort top max_num; descriptor grid_sample at
:192-230) with jittable, batched array programs:

- grid NMS = reduce_window max-pool equality test (a score survives iff it
  is the maximum of its (2r+1)^2 neighborhood);
- selection = lax.top_k over the masked flat heat map (fixed K, validity
  mask instead of dynamic counts);
- descriptor sampling = bilinear interpolation on the 1/8-resolution
  descriptor map (torch::grid_sampler equivalent).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def grid_nms(heat: jnp.ndarray, nms_dist: int) -> jnp.ndarray:
    """Suppress non-maxima within a (2*nms_dist+1)^2 window. heat: (H, W)."""
    k = 2 * nms_dist + 1
    local_max = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return jnp.where(heat >= local_max, heat, 0.0)


def extract_keypoints(
    heat: jnp.ndarray, *, max_keypoints: int, threshold: float,
    nms_dist: int = 4, subpixel: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K NMS'd keypoints of a (H, W) heat map.

    Returns (xy (K, 2) float32 [x, y], scores (K,), valid (K,) bool).
    ``subpixel`` refines each keypoint by the heat-weighted centroid of its
    3x3 neighborhood — integer-quantized keypoints cost ~0.5 px which, at
    stereo-triangulation geometry (z^2/(f b) amplification), dominates
    landmark depth noise.
    """
    H, W = heat.shape
    nms = grid_nms(heat, nms_dist)
    flat = jnp.where(nms > threshold, nms, 0.0).reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    valid = scores > threshold
    x = (idx % W).astype(jnp.int32)
    y = (idx // W).astype(jnp.int32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if subpixel:
        num_x = jnp.zeros_like(xf)
        num_y = jnp.zeros_like(yf)
        den = jnp.zeros_like(xf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yi = jnp.clip(y + dy, 0, H - 1)
                xi = jnp.clip(x + dx, 0, W - 1)
                wgt = jnp.maximum(heat[yi, xi], 0.0)
                num_x += wgt * (x + dx)
                num_y += wgt * (y + dy)
                den += wgt
        den = jnp.maximum(den, 1e-12)
        xf = jnp.clip(num_x / den, 0, W - 1)
        yf = jnp.clip(num_y / den, 0, H - 1)
    xy = jnp.stack([xf, yf], axis=-1)
    return xy, scores, valid


def bilinear_sample_descriptors(
    desc_map: jnp.ndarray, xy: jnp.ndarray, cell: int = 8
) -> jnp.ndarray:
    """Bilinearly sample (Hc, Wc, C) at pixel coords xy (K, 2) / cell.

    Matches torch::grid_sampler(align_corners=False) semantics used by the
    reference: map pixel center to coarse-grid continuous coords.
    """
    Hc, Wc, C = desc_map.shape
    # pixel → coarse-grid continuous coordinates (align_corners=False)
    gx = (xy[:, 0] + 0.5) / cell - 0.5
    gy = (xy[:, 1] + 0.5) / cell - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, Hc - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, Wc - 1)
        return desc_map[yi, xi]

    d00 = gather(y0, x0)
    d01 = gather(y0, x0 + 1)
    d10 = gather(y0 + 1, x0)
    d11 = gather(y0 + 1, x0 + 1)
    wx = wx[:, None]
    wy = wy[:, None]
    return ((1 - wy) * ((1 - wx) * d00 + wx * d01)
            + wy * ((1 - wx) * d10 + wx * d11))
