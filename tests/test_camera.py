"""Camera models: project/lift round trips and YAML loading."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.ops.camera import (
    CameraBearings,
    EquidistantCamera,
    MeiCamera,
    PinholeCamera,
    camera_from_yaml,
)


def random_rays(rng, n, max_angle):
    """Unit rays within max_angle of the optical axis."""
    ang = rng.uniform(0, max_angle, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    return np.stack([np.sin(ang) * np.cos(phi),
                     np.sin(ang) * np.sin(phi),
                     np.cos(ang)], 1).astype(np.float32)


@pytest.mark.parametrize("cam,max_angle", [
    (PinholeCamera(fx=460, fy=460, cx=320, cy=240,
                   k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4), 0.5),
    (MeiCamera(xi=1.9, fx=780, fy=780, cx=320, cy=240,
               k1=-0.1, k2=0.02), 1.2),
    (EquidistantCamera(mu=230, mv=230, u0=320, v0=240,
                       k2=0.01, k3=-0.002, k4=0.0005, k5=0.0), 1.4),
])
def test_project_lift_roundtrip(rng, cam, max_angle):
    rays = random_rays(rng, 256, max_angle)
    depth = rng.uniform(1.0, 10.0, (256, 1)).astype(np.float32)
    pts = rays * depth
    uv, valid = cam.project(jnp.asarray(pts))
    lifted = np.asarray(cam.lift(uv))
    v = np.asarray(valid)
    assert v.all()
    err = np.linalg.norm(lifted - rays, axis=1)
    assert err.max() < 1e-3, err.max()


def test_mei_wide_angle_behind_camera():
    """MEI with xi>1 sees beyond 90 deg; a point at 120 deg round-trips."""
    cam = MeiCamera(xi=2.0, fx=800, fy=800, cx=320, cy=240)
    ang = np.deg2rad(120.0)
    ray = np.array([[np.sin(ang), 0.0, np.cos(ang)]], np.float32)
    uv, valid = cam.project(jnp.asarray(ray * 3.0))
    assert bool(np.asarray(valid)[0])
    lifted = np.asarray(cam.lift(uv))[0]
    assert np.linalg.norm(lifted - ray[0]) < 1e-3


def test_yaml_loader_dict_variants():
    pin = camera_from_yaml({
        "model_type": "PINHOLE",
        "distortion_parameters": {"k1": -0.3, "k2": 0.1, "p1": 0, "p2": 0},
        "projection_parameters": {"fx": 460, "fy": 461, "cx": 320,
                                  "cy": 240}})
    assert isinstance(pin, PinholeCamera) and pin.fy == 461
    mei = camera_from_yaml({
        "model_type": "MEI",
        "mirror_parameters": {"xi": 1.85},
        "distortion_parameters": {"k1": -0.1, "k2": 0.01},
        "projection_parameters": {"gamma1": 780, "gamma2": 781,
                                  "u0": 320, "v0": 240}})
    assert isinstance(mei, MeiCamera) and mei.xi == 1.85 and mei.fy == 781
    kb = camera_from_yaml({
        "model_type": "KANNALA_BRANDT",
        "distortion_parameters": {"k2": 0.01, "k3": -0.002,
                                  "k4": 0.0, "k5": 0.0},
        "projection_parameters": {"mu": 230, "mv": 231, "u0": 320,
                                  "v0": 240}})
    assert isinstance(kb, EquidistantCamera) and kb.mv == 231
    with pytest.raises(ValueError):
        camera_from_yaml({"model_type": "NOPE"})


def test_bearings_adapter_matches_lift(rng):
    cam = EquidistantCamera(mu=230, mv=230, u0=200, v0=104)
    rays = random_rays(rng, 32, 1.2)
    uv, _ = cam.project(jnp.asarray(rays * 2.0))
    b = CameraBearings(cam).bearings(np.asarray(uv))
    assert b.shape == (32, 3)
    np.testing.assert_allclose(b, np.asarray(cam.lift(uv)), atol=1e-6)


def test_pinhole_matches_simple_intrinsics(rng):
    """Zero-distortion PinholeCamera lift == LoopCam's CameraIntrinsics."""
    from omniswarm_tpu.swarm.loop_cam import CameraIntrinsics

    cam = PinholeCamera(fx=200, fy=200, cx=200, cy=104)
    simple = CameraIntrinsics(fx=200, fy=200, cx=200, cy=104)
    xy = rng.uniform(0, 400, (64, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(cam.lift(jnp.asarray(xy))),
                               simple.bearings(xy), atol=1e-5)
