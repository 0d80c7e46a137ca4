"""Image-level synthetic world: a textured wall rendered to stereo pairs.

The feature-level VisualWorld exercises the pipeline with made-up
descriptors; this module goes one tier deeper and produces actual *images*
with exact multi-view geometry, so the real CNN stack (SuperPoint keypoints
+ descriptors, NetVLAD place recognition), the matmul matcher, stereo
triangulation, and PnP RANSAC can be validated end-to-end against ground
truth — the role the reference's recorded camera bags play for swarm_loop
(README.md:29, loop_cam.cpp), reproducible without data downloads.

Geometry: a vertical wall plane at world x = wall_x carries a random shape
texture (metric scale ``m_per_px``). A pin-hole camera at a 4-DoF body pose
(x, y, z, yaw) looks along body +x (camera z forward); each pixel ray is
intersected with the plane and the texture is sampled bilinearly. Stereo
pairs shift the camera along body -y by the baseline.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from omniswarm_tpu.models.train_superpoint import render_shapes
from omniswarm_tpu.swarm.loop_cam import CAM_TO_BODY, CameraIntrinsics


def _rotz(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@dataclass
class WallWorld:
    """Textured wall at world x = wall_x spanning y (right) and z (up)."""

    wall_x: float = 3.0
    tilt: float = 0.45
    m_per_px: float = 0.04
    tex_h: int = 512
    tex_w: int = 768
    n_shapes: int = 150
    seed: int = 0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.texture, _ = render_shapes(rng, self.tex_h, self.tex_w,
                                        n_shapes=self.n_shapes)
        # plane through (wall_x, 0, 0); ``tilt`` yaws its normal away from
        # -x so scene depth varies across the image (a fronto-parallel
        # plane leaves PnP's yaw/lateral-translation pair near-degenerate)
        c, s = np.cos(self.tilt), np.sin(self.tilt)
        self.plane_p0 = np.array([self.wall_x, 0.0, 0.0])
        self.plane_n = np.array([c, s, 0.0])       # pointing toward +x side
        self.plane_e1 = np.array([-s, c, 0.0])     # in-plane horizontal
        self.plane_e2 = np.array([0.0, 0.0, 1.0])  # in-plane vertical

    def plane_distance(self, pts_w: np.ndarray) -> np.ndarray:
        """Signed distance of world points to the wall plane."""
        return (np.asarray(pts_w) - self.plane_p0) @ self.plane_n

    def _sample_texture(self, y_w: np.ndarray, z_w: np.ndarray) -> np.ndarray:
        """In-plane wall coords → bilinear texture sample (background 0.1)."""
        # texture centered: u along -e1, v along -e2
        u = self.tex_w / 2.0 - y_w / self.m_per_px
        v = self.tex_h / 2.0 - z_w / self.m_per_px
        inside = (u >= 0) & (u < self.tex_w - 1) & (v >= 0) & (v < self.tex_h - 1)
        u = np.clip(u, 0, self.tex_w - 2)
        v = np.clip(v, 0, self.tex_h - 2)
        u0 = np.floor(u).astype(int)
        v0 = np.floor(v).astype(int)
        fu, fv = u - u0, v - v0
        t = self.texture
        val = (t[v0, u0] * (1 - fv) * (1 - fu)
               + t[v0 + 1, u0] * fv * (1 - fu)
               + t[v0, u0 + 1] * (1 - fv) * fu
               + t[v0 + 1, u0 + 1] * fv * fu)
        return np.where(inside, val, 0.1).astype(np.float32)

    def render(self, pose: np.ndarray, intr, h: int, w: int, *,
               noise: float = 0.01,
               rng: np.random.Generator | None = None) -> np.ndarray:
        """Render (h, w) grayscale from a 4-DoF body pose.

        ``intr`` is either the simple pinhole CameraIntrinsics or any
        ops.camera model exposing ``lift`` (MEI / Kannala-Brandt fisheye,
        distorted pinhole): each pixel's ray comes from the camera model,
        so rendered images carry the model's true distortion.
        """
        pose = np.asarray(pose, float)
        us, vs = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        if hasattr(intr, "lift"):
            uv = np.stack([us, vs], -1).reshape(-1, 2)
            rays_cam = np.asarray(intr.lift(uv), np.float32).reshape(h, w, 3)
            # normalize to z=1-style scaling not needed: plane intersection
            # below works with any ray scale
        else:
            rays_cam = np.stack([(us - intr.cx) / intr.fx,
                                 (vs - intr.cy) / intr.fy,
                                 np.ones_like(us)], -1)      # (h, w, 3)
        R = _rotz(pose[3]) @ CAM_TO_BODY
        rays_w = rays_cam @ R.T                              # (h, w, 3)
        dn = rays_w @ self.plane_n
        tparam = ((self.plane_p0 - pose[:3]) @ self.plane_n) / np.where(
            np.abs(dn) < 1e-6, 1e-6, dn)
        X = pose[:3] + tparam[..., None] * rays_w            # (h, w, 3)
        rel = X - self.plane_p0
        img = self._sample_texture(rel @ self.plane_e1, rel @ self.plane_e2)
        img = np.where(tparam > 0, img, 0.0)
        if noise and rng is not None:
            img = np.clip(img + rng.normal(0, noise, img.shape), 0, 1)
        return img.astype(np.float32)

    def render_stereo(self, pose: np.ndarray, intr,
                      h: int, w: int, baseline: float, *,
                      noise: float = 0.01,
                      rng: np.random.Generator | None = None):
        """(left, right): right camera shifted by +baseline along camera x.

        Camera x is body -y, so the right camera sits at
        body (0, -baseline, 0) — matching LoopCam's triangulation
        convention.
        """
        pose = np.asarray(pose, float)
        left = self.render(pose, intr, h, w, noise=noise, rng=rng)
        off_w = _rotz(pose[3]) @ np.array([0.0, -baseline, 0.0])
        pose_r = pose.copy()
        pose_r[:3] += off_w
        right = self.render(pose_r, intr, h, w, noise=noise, rng=rng)
        return left, right


class RoomWorld:
    """Four textured walls enclosing the flight volume (an indoor arena).

    Each wall is a vertical plane at x = +-half / y = +-half with its own
    random shape texture; rendering intersects every pixel ray with all
    four planes and samples the nearest one hit. Gives every pose and every
    viewing direction visual structure, so omnidirectional keyframes close
    loops from anywhere inside — the image-level analog of the reference's
    indoor flight arenas.
    """

    def __init__(self, half: float = 6.0, m_per_px: float = 0.04,
                 tex_h: int = 512, tex_w: int = 768, n_shapes: int = 150,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.half = half
        self.m_per_px = m_per_px
        self.tex_h, self.tex_w = tex_h, tex_w
        self.planes = []
        h = half
        # (p0, inward normal n, in-plane e1, e2=up, texture)
        specs = [
            (np.array([h, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0]),
             np.array([0.0, 1.0, 0.0])),
            (np.array([-h, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]),
             np.array([0.0, -1.0, 0.0])),
            (np.array([0.0, h, 0.0]), np.array([0.0, -1.0, 0.0]),
             np.array([-1.0, 0.0, 0.0])),
            (np.array([0.0, -h, 0.0]), np.array([0.0, 1.0, 0.0]),
             np.array([1.0, 0.0, 0.0])),
        ]
        e2 = np.array([0.0, 0.0, 1.0])
        for p0, n, e1 in specs:
            tex, _ = render_shapes(rng, tex_h, tex_w, n_shapes=n_shapes)
            self.planes.append((p0, n, e1, e2, tex))

    def _sample(self, tex, u_m, v_m):
        u = self.tex_w / 2.0 - u_m / self.m_per_px
        v = self.tex_h / 2.0 - v_m / self.m_per_px
        inside = ((u >= 0) & (u < self.tex_w - 1)
                  & (v >= 0) & (v < self.tex_h - 1))
        u = np.clip(u, 0, self.tex_w - 2)
        v = np.clip(v, 0, self.tex_h - 2)
        u0 = np.floor(u).astype(int)
        v0 = np.floor(v).astype(int)
        fu, fv = u - u0, v - v0
        val = (tex[v0, u0] * (1 - fv) * (1 - fu)
               + tex[v0 + 1, u0] * fv * (1 - fu)
               + tex[v0, u0 + 1] * (1 - fv) * fu
               + tex[v0 + 1, u0 + 1] * fv * fu)
        return np.where(inside, val, 0.1).astype(np.float32)

    def render(self, pose: np.ndarray, intr, h: int, w: int, *,
               noise: float = 0.01,
               rng: np.random.Generator | None = None) -> np.ndarray:
        pose = np.asarray(pose, float)
        us, vs = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        if hasattr(intr, "lift"):
            uv = np.stack([us, vs], -1).reshape(-1, 2)
            rays_cam = np.asarray(intr.lift(uv), np.float32).reshape(h, w, 3)
        else:
            rays_cam = np.stack([(us - intr.cx) / intr.fx,
                                 (vs - intr.cy) / intr.fy,
                                 np.ones_like(us)], -1)
        R = _rotz(pose[3]) @ CAM_TO_BODY
        rays_w = rays_cam @ R.T
        best_t = np.full((h, w), np.inf, np.float32)
        img = np.full((h, w), 0.05, np.float32)
        for p0, n, e1, e2, tex in self.planes:
            dn = rays_w @ n
            tparam = ((p0 - pose[:3]) @ n) / np.where(
                np.abs(dn) < 1e-6, 1e-6, dn)
            X = pose[:3] + tparam[..., None] * rays_w
            rel = X - p0
            val = self._sample(tex, rel @ e1, rel @ e2)
            hit = (tparam > 0.05) & (tparam < best_t)
            best_t = np.where(hit, tparam, best_t)
            img = np.where(hit, val, img)
        if noise and rng is not None:
            img = np.clip(img + rng.normal(0, noise, img.shape), 0, 1)
        return img.astype(np.float32)

    def render_stereo(self, pose: np.ndarray, intr, h: int, w: int,
                      baseline: float, *, noise: float = 0.01,
                      rng: np.random.Generator | None = None):
        """(left, right) with the right camera at body (0, -baseline, 0)."""
        pose = np.asarray(pose, float)
        left = self.render(pose, intr, h, w, noise=noise, rng=rng)
        off_w = _rotz(pose[3]) @ np.array([0.0, -baseline, 0.0])
        pose_r = pose.copy()
        pose_r[:3] += off_w
        right = self.render(pose_r, intr, h, w, noise=noise, rng=rng)
        return left, right
