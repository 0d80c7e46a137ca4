"""Pairwise-Consistency-Maximization (PCM) loop outlier rejection.

TPU-native re-design of the reference's SwarmLocalOutlierRejection
(/root/reference/swarm_localization/src/swarm_outlier_rejection/
swarm_outlier_rejection.cpp:98-297):

- the O(L^2) pairwise cycle-consistency errors become ONE batched jit
  computation over the whole loop set (broadcasted 4-DoF pose algebra),
  instead of nested loops per drone pair;
- the max-clique inlier search stays on host (tiny, branchy) using the
  native C++ heuristic (runtime/maxclique.cpp ↔ the reference's vendored
  FMC::maxCliqueHeu);
- decentralized division of labor is preserved: by default only drone pairs
  involving ``self_id`` are computed (the reference broadcasts the inlier
  sets over LCM, :122-139); ``redundant=True`` computes everything locally.

Consistency metric (:228-236): for two loops p_i, p_j between the same drone
pair, err = odom_a ∘ p_j ∘ odom_b^-1 ∘ p_i^-1 where odom_a/odom_b are the
drones' ego-motion between the loops' endpoints; squared Mahalanobis distance
of err under (cov_i + cov_j + odom drift covariances) must stay below
``pcm_thres``.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.core import geometry as geo
from omniswarm_tpu.runtime.native import max_clique


class LoopSet(NamedTuple):
    """Canonicalized loop measurements as struct-of-arrays.

    Canonical form: drone_a <= drone_b (edges flipped on ingest), so the
    reference's same_robot_pair==2 reversed case never arises.
    """

    frame_a: np.ndarray   # (L,)
    drone_a: np.ndarray   # (L,)
    frame_b: np.ndarray   # (L,)
    drone_b: np.ndarray   # (L,)
    dpose: np.ndarray     # (L, 4)
    cov_diag: np.ndarray  # (L, 4) diagonal covariance [x, y, z, yaw]


def loopset_from_measurements(loops: Sequence) -> LoopSet:
    """Build a canonical LoopSet from sim.LoopMeas-like objects."""
    L = len(loops)
    fa = np.zeros(L, np.int32)
    da = np.zeros(L, np.int32)
    fb = np.zeros(L, np.int32)
    db = np.zeros(L, np.int32)
    dp = np.zeros((L, 4), np.float32)
    cov = np.zeros((L, 4), np.float32)
    for i, lp in enumerate(loops):
        dpose = np.asarray(lp.dpose, np.float32)
        a = (lp.frame_a, lp.drone_a)
        b = (lp.frame_b, lp.drone_b)
        if lp.drone_a > lp.drone_b:
            a, b = b, a
            dpose = np.asarray(
                geo.pose_inv(jnp.asarray(dpose)), np.float32)
        fa[i], da[i] = a
        fb[i], db[i] = b
        dp[i] = dpose
        cov[i] = [lp.pos_std**2] * 3 + [lp.yaw_std**2]
    return LoopSet(fa, da, fb, db, dp, cov)


@functools.partial(jax.jit, static_argnames=("vo_cov_pos_per_meter",
                                             "vo_cov_yaw_per_meter"))
def consistency_matrix(
    frame_a: jnp.ndarray, drone_a: jnp.ndarray,
    frame_b: jnp.ndarray, drone_b: jnp.ndarray,
    dpose: jnp.ndarray, cov_diag: jnp.ndarray,
    vio: jnp.ndarray, cumlen: jnp.ndarray,
    *, vo_cov_pos_per_meter: float = 0.002,
    vo_cov_yaw_per_meter: float = 0.0001,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, L) squared-Mahalanobis matrix + same-drone-pair mask.

    vio: (F, D, 4) ego-motion poses; cumlen: (F, D) cumulative arclength.
    """
    # Ego-motion of drone a between the two loops' a-endpoints, ∀ (i, j).
    pa_i = vio[frame_a, drone_a]                      # (L, 4)
    pb_i = vio[frame_b, drone_b]
    odom_a = geo.delta_pose(pa_i[:, None, :], pa_i[None, :, :])   # (L, L, 4)
    odom_b = geo.delta_pose(pb_i[:, None, :], pb_i[None, :, :])

    p_i = dpose[:, None, :]                           # (L, 1, 4)
    p_j = dpose[None, :, :]                           # (1, L, 4)
    # err = odom_a ∘ p_j ∘ odom_b^-1 ∘ p_i^-1  (outlier_rejection.cpp:228)
    err = geo.pose_mul(
        geo.pose_mul(geo.pose_mul(odom_a, p_j), geo.pose_inv(odom_b)),
        geo.pose_inv(jnp.broadcast_to(p_i, odom_a.shape)),
    )

    # Drift covariance along each drone's path between the endpoints.
    len_a = jnp.abs(cumlen[frame_a, drone_a][:, None]
                    - cumlen[frame_a, drone_a][None, :])          # (L, L)
    len_b = jnp.abs(cumlen[frame_b, drone_b][:, None]
                    - cumlen[frame_b, drone_b][None, :])
    path = len_a + len_b
    drift_pos = vo_cov_pos_per_meter * path
    drift_yaw = vo_cov_yaw_per_meter * path
    cov = cov_diag[:, None, :] + cov_diag[None, :, :]
    cov = cov.at[..., :3].add(drift_pos[..., None])
    cov = cov.at[..., 3].add(drift_yaw)

    err = err.at[..., 3].set(geo.normalize_angle(err[..., 3]))
    smd = jnp.sum(err * err / jnp.maximum(cov, 1e-12), axis=-1)

    same_pair = (
        (drone_a[:, None] == drone_a[None, :])
        & (drone_b[:, None] == drone_b[None, :])
    )
    return smd, same_pair


@dataclass
class PCMResult:
    good_mask: np.ndarray                 # (L,) bool
    pair_inliers: Dict[Tuple[int, int], np.ndarray]  # pair -> loop indices
    smd: np.ndarray                       # (L, L) consistency errors


def pcm_filter(
    loops: LoopSet,
    vio: np.ndarray,
    *,
    pcm_thres: float = 0.6,
    self_id: int = -1,
    redundant: bool = True,
    vo_cov_pos_per_meter: float = 0.002,
    vo_cov_yaw_per_meter: float = 0.0001,
    external_inliers: Dict[Tuple[int, int], np.ndarray] | None = None,
) -> PCMResult:
    """Select the PCM-consistent inlier subset of a loop set.

    ``redundant=False`` computes only pairs involving ``self_id``; other
    pairs fall back to ``external_inliers`` (peer-broadcast sets, the LCM
    LOOP_INLIERS channel equivalent) or accept-all — matching
    swarm_outlier_rejection.cpp:122-158.
    """
    L = loops.frame_a.shape[0]
    if L == 0:
        return PCMResult(np.zeros(0, bool), {}, np.zeros((0, 0)))

    vio = np.asarray(vio, np.float32)
    seg = np.linalg.norm(np.diff(vio[:, :, :3], axis=0), axis=-1)  # (F-1, D)
    cumlen = np.concatenate([np.zeros((1, seg.shape[1])),
                             np.cumsum(seg, 0)], 0).astype(np.float32)

    smd, same_pair = consistency_matrix(
        jnp.asarray(loops.frame_a), jnp.asarray(loops.drone_a),
        jnp.asarray(loops.frame_b), jnp.asarray(loops.drone_b),
        jnp.asarray(loops.dpose), jnp.asarray(loops.cov_diag),
        jnp.asarray(vio), jnp.asarray(cumlen),
        vo_cov_pos_per_meter=vo_cov_pos_per_meter,
        vo_cov_yaw_per_meter=vo_cov_yaw_per_meter,
    )
    smd = np.asarray(smd)
    same_pair = np.asarray(same_pair)
    consistent = (smd < pcm_thres) & same_pair
    np.fill_diagonal(consistent, False)

    good = np.zeros(L, bool)
    pair_inliers: Dict[Tuple[int, int], np.ndarray] = {}
    pairs = {(int(a), int(b)) for a, b in zip(loops.drone_a, loops.drone_b)}
    for pair in sorted(pairs):
        idx = np.flatnonzero((loops.drone_a == pair[0])
                             & (loops.drone_b == pair[1]))
        mine = redundant or (self_id in pair) or self_id < 0
        if not mine:
            ext = (external_inliers or {}).get(pair)
            if ext is None:
                good[idx] = True           # no inlier set known: accept all
            else:
                good[np.intersect1d(idx, ext)] = True
                pair_inliers[pair] = np.intersect1d(idx, ext)
            continue
        if idx.size == 1:
            good[idx] = True
            pair_inliers[pair] = idx
            continue
        sub = consistent[np.ix_(idx, idx)]
        clique = max_clique(sub)
        sel = idx[clique]
        good[sel] = True
        pair_inliers[pair] = sel
    return PCMResult(good, pair_inliers, smd)
