"""Fixed-capacity, mask-valid drone trajectories as jnp struct-of-arrays.

Replaces the reference's ``Swarm::DroneTrajectory`` (used for the full-rate
VIO ego-motion history, keyframe trajectories, and the per-meter drift
covariance model consumed when re-anchoring loops — see
/root/reference/swarm_localization/src/swarm_localization_solver.cpp:1505-1550
and the ``vo_cov_pos_per_meter`` / ``vo_cov_yaw_per_meter`` params at
swarm_localization_node.cpp:508-509).

A trajectory is a NamedTuple of fixed-shape arrays; ``append`` writes at a
ring-buffer cursor so the whole structure is jittable with static shapes.
Timestamps are float32 seconds relative to the session epoch (the host layer
owns the absolute-epoch bookkeeping).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from omniswarm_tpu.core import geometry as geo


class Trajectory(NamedTuple):
    """Ring-buffer trajectory. All arrays share leading capacity dim N."""

    ts: jnp.ndarray      # (N,) seconds; invalid slots hold +inf
    pose: jnp.ndarray    # (N, 4) [x, y, z, yaw]
    cumlen: jnp.ndarray  # (N,) cumulative path length at each sample
    cursor: jnp.ndarray  # () int32 next write slot
    count: jnp.ndarray   # () int32 number of valid samples (<= N)

    @property
    def capacity(self) -> int:
        return self.ts.shape[0]


def make_trajectory(capacity: int, dtype=jnp.float32) -> Trajectory:
    return Trajectory(
        ts=jnp.full((capacity,), jnp.inf, dtype=dtype),
        pose=jnp.zeros((capacity, 4), dtype=dtype),
        cumlen=jnp.zeros((capacity,), dtype=dtype),
        cursor=jnp.zeros((), dtype=jnp.int32),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def append(traj: Trajectory, t: jnp.ndarray, pose: jnp.ndarray) -> Trajectory:
    """Append one sample, overwriting the oldest slot when full."""
    n = traj.capacity
    slot = traj.cursor % n
    prev_slot = (slot - 1) % n
    has_prev = traj.count > 0
    seg = jnp.linalg.norm(pose[:3] - traj.pose[prev_slot, :3])
    new_len = jnp.where(has_prev, traj.cumlen[prev_slot] + seg, 0.0)
    return Trajectory(
        ts=traj.ts.at[slot].set(t),
        pose=traj.pose.at[slot].set(pose),
        cumlen=traj.cumlen.at[slot].set(new_len),
        cursor=traj.cursor + 1,
        count=jnp.minimum(traj.count + 1, n),
    )


def nearest_index(traj: Trajectory, t: jnp.ndarray) -> jnp.ndarray:
    """Index of the sample whose timestamp is closest to t (invalid = +inf)."""
    return jnp.argmin(jnp.abs(traj.ts - t))


def pose_at(traj: Trajectory, t: jnp.ndarray) -> jnp.ndarray:
    """Pose of the nearest-in-time sample (reference: pose_by_appro_ts)."""
    return traj.pose[nearest_index(traj, t)]


def length_between(traj: Trajectory, t0: jnp.ndarray, t1: jnp.ndarray) -> jnp.ndarray:
    """Path length travelled between the samples nearest t0 and t1."""
    i0 = nearest_index(traj, t0)
    i1 = nearest_index(traj, t1)
    return jnp.abs(traj.cumlen[i1] - traj.cumlen[i0])


def relative_pose_between(
    traj: Trajectory, t0: jnp.ndarray, t1: jnp.ndarray
) -> jnp.ndarray:
    """4-DoF delta pose between samples nearest t0 and t1 (yaw-only rotation).

    Reference: DroneTrajectory::get_relative_pose_by_ts(.., yaw_only=true)
    consumed by the ego-motion chain (solver.cpp:1156-1178).
    """
    p0 = traj.pose[nearest_index(traj, t0)]
    p1 = traj.pose[nearest_index(traj, t1)]
    return geo.delta_pose(p0, p1)


# ---------------------------------------------------------------------------
# Host-side numpy mirrors — the estimator's graph construction is numpy-pure
# (each eager jnp op is a remote-tunnel round trip), so the per-meter drift
# model is defined once here in scalar/numpy form and reused by the jnp path
# below, swarm/estimator.py (_filter_loops re-anchoring) and robust/pcm.py.
# ---------------------------------------------------------------------------

def drift_variances(length, cov_pos_per_meter: float,
                    cov_yaw_per_meter: float, min_length: float = 1e-3):
    """(pos_var, yaw_var) accumulated over ``length`` meters of travel.

    The reference models VIO drift as covariance proportional to distance
    travelled (DroneTrajectory::covariance_between_appro_ts, consumed at
    swarm_localization_solver.cpp:1505-1550; params vo_cov_pos_per_meter /
    vo_cov_yaw_per_meter, loop-5-drone.launch:50-51). Works on python
    floats, numpy arrays and jnp arrays alike.
    """
    import numpy as _np

    import jax as _jax

    mx = jnp.maximum if isinstance(
        length, (_jax.Array, _jax.core.Tracer)) else _np.maximum
    length = mx(length, min_length)
    return cov_pos_per_meter * length, cov_yaw_per_meter * length


def path_length_np(ts, positions, t0: float, t1: float) -> float:
    """Path length along a sampled trajectory between the samples nearest
    t0 and t1 (numpy host path; mirrors length_between)."""
    import numpy as _np

    if len(ts) == 0:
        return 0.0
    seg = _np.linalg.norm(_np.diff(positions, axis=0), axis=-1)
    cum = _np.concatenate([[0.0], _np.cumsum(seg)])
    i0 = int(_np.argmin(_np.abs(ts - t0)))
    i1 = int(_np.argmin(_np.abs(ts - t1)))
    return float(abs(cum[i1] - cum[i0]))


def drift_covariance_between(
    traj: Trajectory,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    cov_pos_per_meter: float,
    cov_yaw_per_meter: float,
    min_length: float = 1e-3,
) -> jnp.ndarray:
    """4x4 odometry-drift covariance accumulated over the path t0→t1.

    The reference models VIO drift as covariance proportional to distance
    travelled (covariance_between_appro_ts; params loop-5-drone.launch:50-51:
    vo_cov_pos_per_meter=0.002, vo_cov_yaw_per_meter=1e-4).
    """
    pv, yv = drift_variances(length_between(traj, t0, t1),
                             cov_pos_per_meter, cov_yaw_per_meter,
                             min_length)
    return jnp.diag(jnp.stack([pv, pv, pv, yv]))
