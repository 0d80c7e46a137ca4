"""Offline calibration estimators (eval/calibration.py) vs known ground truth.

Mirrors the reference's analysis-script behavior: UWB bias/scale fitting
(local_plot.py:243-330) and per-meter VO drift covariance
(utils.py:105-156), validated against the simulator's known noise knobs.
"""
import numpy as np

from omniswarm_tpu import sim
from omniswarm_tpu.config import SwarmConfig
from omniswarm_tpu.eval.calibration import (
    apply_uwb_calibrations,
    fit_uwb_calibration,
    loop_error_stats,
    odometry_covariance_per_meter,
    uwb_pair_calibrations,
)


def test_fit_uwb_calibration_recovers_bias_scale():
    rng = np.random.default_rng(0)
    true = rng.uniform(1.0, 8.0, size=400)
    bias, scale, noise = 0.35, 1.08, 0.05
    raw = bias + scale * true + rng.normal(0, noise, size=true.shape)
    cal = fit_uwb_calibration(raw, true)
    assert abs(cal.bias - bias) < 0.05
    assert abs(cal.scale - scale) < 0.02
    # calibrated residual std matches the injected noise (scaled by 1/scale)
    assert abs(cal.std_calibrated - noise / scale) < 0.02
    assert cal.rmse_raw > 0.3          # raw error dominated by the bias
    assert cal.num_samples == 400


def test_uwb_pair_calibrations_from_sim():
    params = sim.SimParams(num_drones=3, num_frames=120, seed=5,
                           uwb_noise_std=0.03, uwb_bias=0.4, uwb_scale=1.1)
    data = sim.generate(params)
    calibs = uwb_pair_calibrations(data.ranges, data.range_valid,
                                   data.gt[..., :3])
    assert len(calibs) == 6            # all ordered pairs of 3 drones
    for cal in calibs.values():
        assert abs(cal.bias - 0.4) < 0.12
        assert abs(cal.scale - 1.1) < 0.04
        assert cal.std_calibrated < 0.06

    # fitted table plugs into SwarmConfig and the estimator undoes the model
    cfg = SwarmConfig()
    apply_uwb_calibrations(cfg, calibs)
    from omniswarm_tpu.swarm import SwarmEstimator

    est = SwarmEstimator(cfg.solver, node_configs=cfg.nodes)
    true_d = 4.0
    measured = calibs[(0, 1)].bias + calibs[(0, 1)].scale * true_d
    assert abs(est._calibrate_range((0, 1), measured) - true_d) < 1e-9


def test_odometry_covariance_per_meter_recovers_drift():
    # straight-line walk with a known per-step position noise; steps of
    # length L give cov_per_meter = step_var / L per axis.
    rng = np.random.default_rng(1)
    F, step_len, step_std = 4000, 0.5, 0.02
    yaw = np.zeros(F)
    pos_gt = np.zeros((F, 3))
    pos_gt[:, 0] = np.arange(F) * step_len
    noise = rng.normal(0, step_std, size=(F, 3))
    noise[0] = 0
    pos_vo = pos_gt + np.cumsum(noise, axis=0)
    pos_cov, yaw_var = odometry_covariance_per_meter(
        pos_vo, yaw, pos_gt, yaw, rp_lengths=(1.0,), step=2)
    expected = step_std ** 2 / step_len
    diag = np.diag(pos_cov)
    assert np.all(diag > 0.3 * expected)
    assert np.all(diag < 3.0 * expected)
    assert yaw_var == 0.0


def test_odometry_covariance_scales_with_noise():
    rng = np.random.default_rng(2)
    F = 2000
    yaw = rng.normal(0, 0.1, size=F)
    pos_gt = np.cumsum(rng.normal(0, 0.3, size=(F, 3)), axis=0)

    def vo_with(std, seed):
        r = np.random.default_rng(seed)
        n = r.normal(0, std, size=(F, 3))
        n[0] = 0
        return pos_gt + np.cumsum(n, axis=0)

    cov_lo, _ = odometry_covariance_per_meter(
        vo_with(0.01, 3), yaw, pos_gt, yaw, rp_lengths=(1.0, 2.0), step=3)
    cov_hi, _ = odometry_covariance_per_meter(
        vo_with(0.04, 4), yaw, pos_gt, yaw, rp_lengths=(1.0, 2.0), step=3)
    assert np.trace(cov_hi) > 5.0 * np.trace(cov_lo)


def test_loop_error_stats_flags_outliers():
    params = sim.SimParams(num_drones=3, num_frames=60, seed=9,
                           loop_outlier_rate=0.2, loop_outlier_mag=6.0)
    data = sim.generate(params)
    stats = loop_error_stats(data.loops, data.gt)
    assert stats["num_loops"] == len(data.loops)
    assert stats["gross_outlier_frac"] > 0.05
    clean = sim.generate(sim.SimParams(num_drones=3, num_frames=60, seed=9))
    stats_clean = loop_error_stats(clean.loops, clean.gt)
    assert stats_clean["pos_rmse"] < stats["pos_rmse"]
