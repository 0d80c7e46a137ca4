"""Factor residual/Jacobian tests vs independent float64 numpy references."""
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.solver import factors as fx


# ---- independent numpy (float64) reimplementations ------------------------

def np_normalize(a):
    return a - 2 * np.pi * np.floor((a + np.pi) / (2 * np.pi))


def np_yaw_rot(yaw, v):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], v[2]])


def np_delta_pose(a, b):
    dt = np_yaw_rot(-a[3], b[:3] - a[:3])
    return np.concatenate([dt, [np_normalize(b[3] - a[3])]])


def np_pose_mul(a, b):
    t = np_yaw_rot(a[3], b[:3]) + a[:3]
    return np.concatenate([t, [np_normalize(a[3] + b[3])]])


def np_range_residual(pa, pb, d, si):
    return np.array([(np.linalg.norm(pa[:3] - pb[:3]) - d) * si])


def np_relpose_residual(pa, pb, meas, sqrt_info):
    err = meas - np_delta_pose(pa, pb)
    err[3] = np_normalize(err[3])
    return sqrt_info @ err


def np_detection_residual(pa, pb, direction, tb, inv_dep, dpa, dpb,
                          sphere_std=0.1, inv_dep_std=0.5):
    a = np_pose_mul(pa, dpa)
    b = np_pose_mul(pb, dpb)
    rel = np_yaw_rot(-a[3], b[:3] - a[:3])
    n = np.linalg.norm(rel)
    err3 = rel / n - direction
    out = np.zeros(3)
    out[:2] = tb @ err3 / sphere_std
    out[2] = (inv_dep - 1.0 / n) / inv_dep_std
    return out


def numeric_jac(fn, x, eps=1e-6):
    x = np.asarray(x, np.float64)
    f0 = fn(x)
    J = np.zeros((f0.shape[0], x.shape[0]))
    for i in range(x.shape[0]):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        J[:, i] = (fn(xp) - fn(xm)) / (2 * eps)
    return J


def rand_pose(rng):
    return np.concatenate([rng.normal(size=3) * 5,
                           rng.uniform(-3, 3, size=1)])


def test_range_residual_and_jacobian(rng):
    for _ in range(10):
        pa, pb = rand_pose(rng), rand_pose(rng)
        d, si = 3.0, 7.07
        ev = fx.range_eval(
            jnp.asarray(pa, jnp.float32)[None], jnp.asarray(pb, jnp.float32)[None],
            jnp.asarray([d], jnp.float32), jnp.asarray([si], jnp.float32))
        np.testing.assert_allclose(
            np.asarray(ev.residual[0]), np_range_residual(pa, pb, d, si), atol=1e-4)
        Ja = numeric_jac(lambda x: np_range_residual(x, pb, d, si), pa)
        Jb = numeric_jac(lambda x: np_range_residual(pa, x, d, si), pb)
        np.testing.assert_allclose(np.asarray(ev.jac_a[0]), Ja, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ev.jac_b[0]), Jb, atol=1e-3)


def test_relpose_residual_and_jacobian(rng):
    for _ in range(10):
        pa, pb = rand_pose(rng), rand_pose(rng)
        meas = rand_pose(rng)
        sqrt_info = np.diag(rng.uniform(0.5, 10, size=4))
        ev = fx.relpose_eval(
            jnp.asarray(pa, jnp.float32)[None], jnp.asarray(pb, jnp.float32)[None],
            jnp.asarray(meas, jnp.float32)[None],
            jnp.asarray(sqrt_info, jnp.float32)[None])
        np.testing.assert_allclose(
            np.asarray(ev.residual[0]),
            np_relpose_residual(pa, pb, meas, sqrt_info), atol=1e-3)
        Ja = numeric_jac(lambda x: np_relpose_residual(x, pb, meas, sqrt_info), pa)
        Jb = numeric_jac(lambda x: np_relpose_residual(pa, x, meas, sqrt_info), pb)
        np.testing.assert_allclose(np.asarray(ev.jac_a[0]), Ja, atol=2e-3)
        np.testing.assert_allclose(np.asarray(ev.jac_b[0]), Jb, atol=2e-3)


def test_detection_residual_and_jacobian(rng):
    det_eval = fx.make_detection_eval(0.1, 0.5)
    for _ in range(10):
        pa, pb = rand_pose(rng), rand_pose(rng)
        dpa, dpb = rand_pose(rng) * 0.05, rand_pose(rng) * 0.05
        # ground-truth-ish bearing with noise
        a = np_pose_mul(pa, dpa)
        b = np_pose_mul(pb, dpb)
        rel = np_yaw_rot(-a[3], b[:3] - a[:3])
        direction = rel / np.linalg.norm(rel) + rng.normal(size=3) * 0.02
        direction /= np.linalg.norm(direction)
        from omniswarm_tpu.core import geometry as geo
        tb = np.asarray(geo.tangent_base_from_unit(jnp.asarray(direction, jnp.float32)))
        inv_dep = 1.0 / np.linalg.norm(rel) + 0.01

        ev = det_eval(
            jnp.asarray(pa, jnp.float32)[None], jnp.asarray(pb, jnp.float32)[None],
            jnp.asarray(direction, jnp.float32)[None],
            jnp.asarray(tb, jnp.float32)[None],
            jnp.asarray([inv_dep], jnp.float32),
            jnp.asarray(dpa, jnp.float32)[None],
            jnp.asarray(dpb, jnp.float32)[None],
            jnp.asarray([True]))
        ref = np_detection_residual(pa, pb, direction, tb, inv_dep, dpa, dpb)
        np.testing.assert_allclose(np.asarray(ev.residual[0]), ref, atol=1e-3)
        Ja = numeric_jac(
            lambda x: np_detection_residual(x, pb, direction, tb, inv_dep, dpa, dpb), pa)
        Jb = numeric_jac(
            lambda x: np_detection_residual(pa, x, direction, tb, inv_dep, dpa, dpb), pb)
        np.testing.assert_allclose(np.asarray(ev.jac_a[0]), Ja, atol=3e-3)
        np.testing.assert_allclose(np.asarray(ev.jac_b[0]), Jb, atol=3e-3)


def test_detection_depth_mask(rng):
    det_eval = fx.make_detection_eval(0.1, 0.5)
    pa, pb = rand_pose(rng), rand_pose(rng)
    ident = np.zeros(4)
    args = (
        jnp.asarray(pa, jnp.float32)[None], jnp.asarray(pb, jnp.float32)[None],
        jnp.asarray([[1.0, 0, 0]], jnp.float32),
        jnp.asarray([[[0, 1, 0], [0, 0, 1.0]]], jnp.float32),
        jnp.asarray([0.5], jnp.float32),
        jnp.asarray(ident, jnp.float32)[None],
        jnp.asarray(ident, jnp.float32)[None],
    )
    with_depth = det_eval(*args, jnp.asarray([True]))
    without = det_eval(*args, jnp.asarray([False]))
    assert abs(float(without.residual[0, 2])) < 1e-8
    np.testing.assert_allclose(np.asarray(with_depth.residual[0, :2]),
                               np.asarray(without.residual[0, :2]), atol=1e-7)


def test_huber_weight_and_rho():
    r_small = jnp.asarray([[0.3, 0.4]])   # norm 0.5 <= 1 → weight 1
    r_big = jnp.asarray([[3.0, 4.0]])     # norm 5 → weight 1/5
    np.testing.assert_allclose(float(fx.huber_weight(r_small, 1.0)[0]), 1.0)
    np.testing.assert_allclose(float(fx.huber_weight(r_big, 1.0)[0]), 0.2)
    np.testing.assert_allclose(float(fx.huber_rho(jnp.asarray(0.25), 1.0)), 0.25)
    np.testing.assert_allclose(float(fx.huber_rho(jnp.asarray(25.0), 1.0)), 9.0)
