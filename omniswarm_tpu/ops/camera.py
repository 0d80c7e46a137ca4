"""Camera models: pinhole+radtan, MEI (unified omni), Kannala-Brandt fisheye.

TPU-native counterpart of the camodocal camera models the reference links
(`liftProjective` calls in /root/reference/swarm_loop/src/loop_cam.cpp:405-454
and the fisheye reprojection in swarm_localization/test/swarm_local_sim.cpp;
camera YAMLs are loaded per direction at swarm_loop.cpp:272-306). Everything
is batched jnp with static iteration counts, so `lift`/`project` vmap/jit
cleanly and run on accelerator inside the front-end pipeline.

Conventions: camera frame x right, y down, z forward; pixels (u, v);
`lift` returns unit rays, `project` returns pixels plus a validity mask
(point in front / inside the model's domain).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _unit(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True),
                           1e-12)


def _distort_radtan(mx, my, k1, k2, p1, p2):
    r2 = mx * mx + my * my
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * mx * my + p2 * (r2 + 2.0 * mx * mx)
    dy = p1 * (r2 + 2.0 * my * my) + 2.0 * p2 * mx * my
    return mx * rad + dx, my * rad + dy


def _undistort_radtan(ux, uy, k1, k2, p1, p2, iters: int = 8):
    """Fixed-point inversion of the radtan map (standard OpenCV recursion)."""
    mx, my = ux, uy
    for _ in range(iters):
        r2 = mx * mx + my * my
        rad = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * mx * my + p2 * (r2 + 2.0 * mx * mx)
        dy = p1 * (r2 + 2.0 * my * my) + 2.0 * p2 * mx * my
        mx = (ux - dx) / rad
        my = (uy - dy) / rad
    return mx, my


@dataclass(frozen=True)
class PinholeCamera:
    """Pinhole + radial-tangential distortion (camodocal PINHOLE)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    def project(self, p3: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p3 = jnp.asarray(p3)
        z = jnp.maximum(p3[..., 2], 1e-9)
        mx, my = p3[..., 0] / z, p3[..., 1] / z
        dx, dy = _distort_radtan(mx, my, self.k1, self.k2, self.p1, self.p2)
        uv = jnp.stack([self.fx * dx + self.cx, self.fy * dy + self.cy], -1)
        return uv, p3[..., 2] > 1e-9

    def lift(self, uv: jnp.ndarray) -> jnp.ndarray:
        uv = jnp.asarray(uv)
        ux = (uv[..., 0] - self.cx) / self.fx
        uy = (uv[..., 1] - self.cy) / self.fy
        mx, my = _undistort_radtan(ux, uy, self.k1, self.k2, self.p1,
                                   self.p2)
        return _unit(jnp.stack([mx, my, jnp.ones_like(mx)], -1))


@dataclass(frozen=True)
class MeiCamera:
    """MEI / unified omnidirectional model (camodocal MEI, fisheye-capable).

    Projection: unit-sphere point s = p/|p|, projective division by
    (s_z + xi), radtan distortion, then K. Lift uses the closed-form sphere
    reprojection (camodocal CataCamera::liftProjective).
    """

    xi: float
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    def project(self, p3: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p3 = jnp.asarray(p3)
        s = _unit(p3)
        den = s[..., 2] + self.xi
        valid = den > 1e-6
        den = jnp.where(valid, den, 1.0)
        mx, my = s[..., 0] / den, s[..., 1] / den
        dx, dy = _distort_radtan(mx, my, self.k1, self.k2, self.p1, self.p2)
        uv = jnp.stack([self.fx * dx + self.cx, self.fy * dy + self.cy], -1)
        return uv, valid

    def lift(self, uv: jnp.ndarray) -> jnp.ndarray:
        uv = jnp.asarray(uv)
        ux = (uv[..., 0] - self.cx) / self.fx
        uy = (uv[..., 1] - self.cy) / self.fy
        mx, my = _undistort_radtan(ux, uy, self.k1, self.k2, self.p1,
                                   self.p2)
        r2 = mx * mx + my * my
        xi = self.xi
        # closed form: factor maps the undistorted projective point back to
        # the unit sphere
        factor = (xi + jnp.sqrt(jnp.maximum(
            1.0 + (1.0 - xi * xi) * r2, 0.0))) / (1.0 + r2)
        ray = jnp.stack([factor * mx, factor * my, factor - xi], -1)
        return _unit(ray)


@dataclass(frozen=True)
class EquidistantCamera:
    """Kannala-Brandt fisheye (camodocal KANNALA_BRANDT / EQUIDISTANT).

    r_d(theta) = theta + k2 th^3 + k3 th^5 + k4 th^7 + k5 th^9 (camodocal's
    coefficient naming: mu/mv focal, k2..k5 odd-poly).
    """

    mu: float
    mv: float
    u0: float
    v0: float
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0

    def _theta_poly(self, th):
        th2 = th * th
        return th * (1.0 + th2 * (self.k2 + th2 * (
            self.k3 + th2 * (self.k4 + th2 * self.k5))))

    def project(self, p3: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p3 = jnp.asarray(p3)
        r = jnp.sqrt(p3[..., 0] ** 2 + p3[..., 1] ** 2)
        theta = jnp.arctan2(r, p3[..., 2])
        rd = self._theta_poly(theta)
        scale = rd / jnp.maximum(r, 1e-12)
        uv = jnp.stack([self.mu * scale * p3[..., 0] + self.u0,
                        self.mv * scale * p3[..., 1] + self.v0], -1)
        # the odd polynomial is monotone only within the calibrated FOV
        return uv, theta < jnp.pi * 0.95

    def lift(self, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
        uv = jnp.asarray(uv)
        px = (uv[..., 0] - self.u0) / self.mu
        py = (uv[..., 1] - self.v0) / self.mv
        rd = jnp.sqrt(px * px + py * py)
        # invert rd = poly(theta) by Newton with static trip count
        theta = rd
        for _ in range(iters):
            th2 = theta * theta
            f = self._theta_poly(theta) - rd
            fp = 1.0 + th2 * (3.0 * self.k2 + th2 * (
                5.0 * self.k3 + th2 * (7.0 * self.k4
                                       + th2 * 9.0 * self.k5)))
            theta = theta - f / jnp.maximum(fp, 1e-6)
        sin_t = jnp.sin(theta)
        cos_t = jnp.cos(theta)
        inv_rd = 1.0 / jnp.maximum(rd, 1e-12)
        ray = jnp.stack([sin_t * px * inv_rd, sin_t * py * inv_rd, cos_t],
                        -1)
        # at the optical center the ray is straight ahead
        ctr = rd[..., None] < 1e-9
        fwd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], ray.dtype),
                               ray.shape)
        return _unit(jnp.where(ctr, fwd, ray))


def camera_from_yaml(path_or_dict) -> object:
    """Build a camera from a camodocal-style YAML (model_type + param maps).

    Mirrors the files the reference feeds camodocal
    (swarm_loop.cpp:272-306): `model_type` PINHOLE / MEI / KANNALA_BRANDT,
    `distortion_parameters` {k1 k2 p1 p2} or {k2..k5},
    `projection_parameters` {fx fy cx cy} / {gamma1 gamma2 u0 v0} /
    {mu mv u0 v0}, and `mirror_parameters` {xi} for MEI.
    """
    if isinstance(path_or_dict, dict):
        cfg = path_or_dict
    else:
        import yaml

        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    mt = str(cfg.get("model_type", "PINHOLE")).upper()
    d = cfg.get("distortion_parameters", {}) or {}
    p = cfg.get("projection_parameters", {}) or {}
    if mt == "PINHOLE":
        return PinholeCamera(
            fx=float(p["fx"]), fy=float(p["fy"]),
            cx=float(p["cx"]), cy=float(p["cy"]),
            k1=float(d.get("k1", 0)), k2=float(d.get("k2", 0)),
            p1=float(d.get("p1", 0)), p2=float(d.get("p2", 0)))
    if mt == "MEI":
        m = cfg.get("mirror_parameters", {}) or {}
        return MeiCamera(
            xi=float(m.get("xi", 1.0)),
            fx=float(p.get("gamma1", p.get("fx"))),
            fy=float(p.get("gamma2", p.get("fy"))),
            cx=float(p.get("u0", p.get("cx"))),
            cy=float(p.get("v0", p.get("cy"))),
            k1=float(d.get("k1", 0)), k2=float(d.get("k2", 0)),
            p1=float(d.get("p1", 0)), p2=float(d.get("p2", 0)))
    if mt in ("KANNALA_BRANDT", "EQUIDISTANT", "FISHEYE"):
        return EquidistantCamera(
            mu=float(p.get("mu", p.get("fx"))),
            mv=float(p.get("mv", p.get("fy"))),
            u0=float(p.get("u0", p.get("cx"))),
            v0=float(p.get("v0", p.get("cy"))),
            k2=float(d.get("k2", 0)), k3=float(d.get("k3", 0)),
            k4=float(d.get("k4", 0)), k5=float(d.get("k5", 0)))
    raise ValueError(f"unknown model_type {mt!r}")


class CameraBearings:
    """Adapter exposing numpy ``bearings(xy)`` for LoopCam drop-in use."""

    def __init__(self, camera):
        self.camera = camera

    def bearings(self, xy: np.ndarray) -> np.ndarray:
        return np.asarray(self.camera.lift(jnp.asarray(xy, jnp.float32)))
