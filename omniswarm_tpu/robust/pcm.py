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
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

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


def _consistency_core(
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


consistency_matrix = jax.jit(
    _consistency_core,
    static_argnames=("vo_cov_pos_per_meter", "vo_cov_yaw_per_meter"))


@functools.partial(jax.jit, static_argnames=("vo_cov_pos_per_meter",
                                             "vo_cov_yaw_per_meter"))
def consistency_mask(
    frame_a, drone_a, frame_b, drone_b, dpose, cov_diag, valid,
    vio, cumlen, thres,
    *, vo_cov_pos_per_meter: float = 0.002,
    vo_cov_yaw_per_meter: float = 0.0001,
) -> jnp.ndarray:
    """Thresholded (L, L) bool consistency — the production-path variant:
    the smd matrix stays on device (an (L, L) f32 transfer is 4 bytes/pair
    — at 2k loops that's 16 MB over a remote-TPU tunnel; the bool mask is
    1/4 of it) and padding rows are masked so the caller can bucket L to a
    few compile shapes."""
    smd, same_pair = _consistency_core(
        frame_a, drone_a, frame_b, drone_b, dpose, cov_diag, vio, cumlen,
        vo_cov_pos_per_meter=vo_cov_pos_per_meter,
        vo_cov_yaw_per_meter=vo_cov_yaw_per_meter)
    return (smd < thres) & same_pair & valid[:, None] & valid[None, :]


@functools.partial(jax.jit, static_argnames=("vo_cov_pos_per_meter",
                                             "vo_cov_yaw_per_meter"))
def consistency_mask_bits(
    frame_a, drone_a, frame_b, drone_b, dpose, cov_diag, valid,
    vio, cumlen, thres,
    *, vo_cov_pos_per_meter: float = 0.002,
    vo_cov_yaw_per_meter: float = 0.0001,
) -> jnp.ndarray:
    """consistency_mask with the (L, L) bool packed to (L, L/8) uint8 on
    device — an 8x smaller transfer (a 2k-loop mask is 4 MB of bools but
    512 KB of bits; the wire runs ~30 MB/s)."""
    mask = consistency_mask(
        frame_a, drone_a, frame_b, drone_b, dpose, cov_diag, valid,
        vio, cumlen, thres,
        vo_cov_pos_per_meter=vo_cov_pos_per_meter,
        vo_cov_yaw_per_meter=vo_cov_yaw_per_meter)
    return jnp.packbits(mask, axis=1)


def pcm_launch_all(loops: LoopSet, vio: np.ndarray, *,
                   pcm_thres: float = 0.6,
                   vo_cov_pos_per_meter: float = 0.002,
                   vo_cov_yaw_per_meter: float = 0.0001) -> dict:
    """Async phase 1 of an all-pairs PCM pass: pad, dispatch the
    consistency kernel, return a handle WITHOUT waiting. The device
    executes while the caller does other work (e.g. the LM solve);
    ``pcm_finish_all`` downloads + runs the max-cliques later. This is
    how the online estimator keeps the consistency pass off the solve
    tick's critical path (the kernel round is RTT-bound over a remote
    tunnel)."""
    n = loops.frame_a.shape[0]
    vio = np.asarray(vio, np.float32)
    seg = np.linalg.norm(np.diff(vio[:, :, :3], axis=0), axis=-1)
    cumlen = np.concatenate([np.zeros((1, seg.shape[1])),
                             np.cumsum(seg, 0)], 0).astype(np.float32)
    Lb = 64
    while Lb < n:
        Lb *= 2
    Fb = max(64, ((vio.shape[0] + 63) // 64) * 64)

    def pad1(x, fill=0):
        out = np.full((Lb,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    vio_p = np.zeros((Fb,) + vio.shape[1:], vio.dtype)
    vio_p[: vio.shape[0]] = vio
    cum_p = np.zeros((Fb,) + cumlen.shape[1:], cumlen.dtype)
    cum_p[: cumlen.shape[0]] = cumlen
    valid = np.zeros(Lb, bool)
    valid[:n] = True
    bits = consistency_mask_bits(
        pad1(loops.frame_a), pad1(loops.drone_a),
        pad1(loops.frame_b), pad1(loops.drone_b),
        pad1(loops.dpose), pad1(loops.cov_diag, 1), valid,
        vio_p, cum_p, jnp.float32(pcm_thres),
        vo_cov_pos_per_meter=vo_cov_pos_per_meter,
        vo_cov_yaw_per_meter=vo_cov_yaw_per_meter)
    return {"bits": bits, "n": n, "Lb": Lb, "loops": loops}


def pcm_finish_all(handle: dict) -> "PCMResult":
    """Phase 2: download the bit mask (usually ready) + per-pair
    max-cliques. Equivalent to pcm_filter(..., redundant=True,
    return_smd=False) over the launched loop set."""
    loops, n, Lb = handle["loops"], handle["n"], handle["Lb"]
    consistent = np.unpackbits(
        np.asarray(handle["bits"]), axis=1, count=Lb)[:n, :n].astype(bool)
    np.fill_diagonal(consistent, False)
    good = np.zeros(n, bool)
    pair_inliers: Dict[Tuple[int, int], np.ndarray] = {}
    pairs = {(int(a), int(b)) for a, b in zip(loops.drone_a, loops.drone_b)}
    for pair in sorted(pairs):
        idx = np.flatnonzero((loops.drone_a == pair[0])
                             & (loops.drone_b == pair[1]))
        if idx.size == 1:
            good[idx] = True
            pair_inliers[pair] = idx
            continue
        subm = consistent[np.ix_(idx, idx)]
        clique = max_clique(subm)
        sel = idx[clique]
        good[sel] = True
        pair_inliers[pair] = sel
    return PCMResult(good, pair_inliers, None)


@dataclass
class PCMResult:
    good_mask: np.ndarray                 # (L,) bool
    pair_inliers: Dict[Tuple[int, int], np.ndarray]  # pair -> loop indices
    smd: Optional[np.ndarray]             # (L, L) errors (return_smd only)


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
    return_smd: bool = True,
) -> PCMResult:
    """Select the PCM-consistent inlier subset of a loop set.

    ``redundant=False`` computes only pairs involving ``self_id``; other
    pairs fall back to ``external_inliers`` (peer-broadcast sets, the LCM
    LOOP_INLIERS channel equivalent) or accept-all — matching
    swarm_outlier_rejection.cpp:122-158.

    Production-path notes (the estimator passes ``return_smd=False``):
    only loops whose pair requires LOCAL computation enter the (L, L)
    consistency kernel; L is bucketed to multiples of 64 with a validity
    mask so the jit compiles once per bucket, not once per loop count
    (every fresh shape is a multi-second recompile over a remote-TPU
    tunnel); thresholding happens on device and only the bool mask
    transfers. ``return_smd=True`` additionally materializes the full
    (L, L) smd matrix for forensics (eval/pcm_debug).
    """
    L = loops.frame_a.shape[0]
    if L == 0:
        return PCMResult(np.zeros(0, bool), {},
                         np.zeros((0, 0)) if return_smd else None)

    vio = np.asarray(vio, np.float32)
    seg = np.linalg.norm(np.diff(vio[:, :, :3], axis=0), axis=-1)  # (F-1, D)
    cumlen = np.concatenate([np.zeros((1, seg.shape[1])),
                             np.cumsum(seg, 0)], 0).astype(np.float32)

    # --- subset needing local consistency computation -------------------
    compute_all = redundant or self_id < 0
    if compute_all:
        sub = np.arange(L)
    else:
        sub = np.flatnonzero((loops.drone_a == self_id)
                             | (loops.drone_b == self_id))
    n = sub.size
    consistent = None
    if n:
        def _bucket(k, step):
            return max(step, ((k + step - 1) // step) * step)

        def _bucket_pow2(k, lo=64):
            # power-of-two loop buckets: the incremental per-pair path
            # feeds ever-varying subset sizes, and every distinct shape
            # is a fresh multi-second compile over a remote-TPU tunnel —
            # pow2 caps the variant count at ~6
            b = lo
            while b < k:
                b *= 2
            return b

        Lb = _bucket_pow2(n)
        Fb = _bucket(vio.shape[0], 64)

        def pad1(x, fill=0):
            out = np.full((Lb,) + x.shape[1:], fill, x.dtype)
            out[:n] = x[sub]
            return out

        vio_p = np.zeros((Fb,) + vio.shape[1:], vio.dtype)
        vio_p[: vio.shape[0]] = vio
        cum_p = np.zeros((Fb,) + cumlen.shape[1:], cumlen.dtype)
        cum_p[: cumlen.shape[0]] = cumlen
        valid = np.zeros(Lb, bool)
        valid[:n] = True
        bits = consistency_mask_bits(
            pad1(loops.frame_a), pad1(loops.drone_a),
            pad1(loops.frame_b), pad1(loops.drone_b),
            pad1(loops.dpose), pad1(loops.cov_diag, 1), valid,
            vio_p, cum_p, jnp.float32(pcm_thres),
            vo_cov_pos_per_meter=vo_cov_pos_per_meter,
            vo_cov_yaw_per_meter=vo_cov_yaw_per_meter,
        )
        # download the FULL padded bit block and slice on host: a device
        # slice bits[:n] with per-call n compiles a fresh (tiny) XLA
        # program each tick — ~0.5 s over the remote tunnel
        consistent = np.unpackbits(
            np.asarray(bits), axis=1, count=Lb)[:n, :n].astype(bool)
        np.fill_diagonal(consistent, False)
    sub_pos = {int(g): i for i, g in enumerate(sub)}

    smd = None
    if return_smd:
        smd_dev, _ = consistency_matrix(
            jnp.asarray(loops.frame_a), jnp.asarray(loops.drone_a),
            jnp.asarray(loops.frame_b), jnp.asarray(loops.drone_b),
            jnp.asarray(loops.dpose), jnp.asarray(loops.cov_diag),
            jnp.asarray(vio), jnp.asarray(cumlen),
            vo_cov_pos_per_meter=vo_cov_pos_per_meter,
            vo_cov_yaw_per_meter=vo_cov_yaw_per_meter,
        )
        smd = np.asarray(smd_dev)

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
        pos = np.asarray([sub_pos[int(i)] for i in idx])
        subm = consistent[np.ix_(pos, pos)]
        clique = max_clique(subm)
        sel = idx[clique]
        good[sel] = True
        pair_inliers[pair] = sel
    return PCMResult(good, pair_inliers, smd)
