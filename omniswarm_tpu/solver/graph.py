"""Fixed-shape, masked factor-graph containers + host-side builder.

The reference assembles a Ceres problem from pointer-linked dynamic
structures (EstimatePoses maps sharing 4-double blocks,
swarm_localization_solver.hpp:46-50). On TPU the problem must be a static
shape: the state is a dense ``(F, D, 4)`` pose grid (F sliding-window frames
× D drones) and every factor family is a fixed-capacity struct-of-arrays with
a validity mask. Keyframe admission/eviction and pose merging become index
and mask updates — never a recompile.

Index convention: a pose is addressed by ``(frame, drone)``; its flat node id
is ``frame * D + drone`` and its parameters occupy ``[4*node, 4*node+4)`` in
the flattened state vector.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RangeFactors(NamedTuple):
    """UWB distance factors between two drones in the same frame.

    Reference: setup_problem_with_sferror (solver.cpp:1102-1154) adds
    DistanceMeasurementFactor per (frame, pair) with sqrt_inf
    1/sqrt(distance_measurement_cov).
    """

    frame: jnp.ndarray    # (R,) i32
    drone_a: jnp.ndarray  # (R,) i32
    drone_b: jnp.ndarray  # (R,) i32
    dist: jnp.ndarray     # (R,) f32
    sqrt_inf: jnp.ndarray  # (R,) f32
    valid: jnp.ndarray    # (R,) bool


class RelPoseFactors(NamedTuple):
    """4-DoF relative pose factors: ego-motion chains AND loop edges.

    Reference: RelativePoseFactor4d used for both
    (setup_problem_with_ego_motion solver.cpp:1156-1198,
    setup_problem_with_loops_and_detections :1064-1100).
    """

    frame_a: jnp.ndarray   # (L,) i32
    drone_a: jnp.ndarray   # (L,) i32
    frame_b: jnp.ndarray   # (L,) i32
    drone_b: jnp.ndarray   # (L,) i32
    dpose: jnp.ndarray     # (L, 4)
    sqrt_info: jnp.ndarray  # (L, 4, 4)
    valid: jnp.ndarray     # (L,) bool


class DetectionFactors(NamedTuple):
    """Visual drone-to-drone bearing(+inv-depth) factors.

    Reference: DroneDetection4dFactor (factors.hpp:273-367).
    ``dpose_a``/``dpose_b`` fold in the camera extrinsic / intra-frame
    self-motion corrections (the reference's enable_dpose branch).
    """

    frame_a: jnp.ndarray   # (K,) i32
    drone_a: jnp.ndarray   # (K,) i32
    frame_b: jnp.ndarray   # (K,) i32
    drone_b: jnp.ndarray   # (K,) i32
    direction: jnp.ndarray  # (K, 3) unit bearing
    tangent_base: jnp.ndarray  # (K, 2, 3)
    inv_dep: jnp.ndarray   # (K,)
    dpose_a: jnp.ndarray   # (K, 4)
    dpose_b: jnp.ndarray   # (K, 4)
    enable_depth: jnp.ndarray  # (K,) bool
    valid: jnp.ndarray     # (K,) bool


class FactorGraph(NamedTuple):
    """The full masked problem over a (F, D, 4) pose grid."""

    ranges: RangeFactors
    odoms: RelPoseFactors     # ego-motion chains (no robust loss)
    loops: RelPoseFactors     # loop closures + 4d/6d detections-as-relpose
    dets: DetectionFactors    # bearing detections (robust loss)
    pose_valid: jnp.ndarray   # (F, D) bool — pose exists in the window
    pose_fixed: jnp.ndarray   # (F, D) bool — gauge-fixed (first self pose)
    yaw_fixed: jnp.ndarray    # (F, D) bool — yaw weakly observable → frozen
    # Optional per-drone UWB antenna offsets (D, 3) in body frame; None ==
    # all-zero (fast path). Reference: anntena_pos in swarm_nodes5.yaml,
    # loaded at swarm_localization_node.cpp:300-328.
    ant_pos: jnp.ndarray = None

    @property
    def num_frames(self) -> int:
        return self.pose_valid.shape[0]

    @property
    def num_drones(self) -> int:
        return self.pose_valid.shape[1]


def empty_ranges(capacity: int, dtype=jnp.float32) -> RangeFactors:
    zi = jnp.zeros((capacity,), jnp.int32)
    zf = jnp.zeros((capacity,), dtype)
    return RangeFactors(zi, zi, zi, zf, zf, jnp.zeros((capacity,), bool))


def empty_relpose(capacity: int, dtype=jnp.float32) -> RelPoseFactors:
    zi = jnp.zeros((capacity,), jnp.int32)
    return RelPoseFactors(
        zi, zi, zi, zi,
        jnp.zeros((capacity, 4), dtype),
        jnp.zeros((capacity, 4, 4), dtype),
        jnp.zeros((capacity,), bool),
    )


def empty_detections(capacity: int, dtype=jnp.float32) -> DetectionFactors:
    zi = jnp.zeros((capacity,), jnp.int32)
    return DetectionFactors(
        zi, zi, zi, zi,
        jnp.zeros((capacity, 3), dtype),
        jnp.zeros((capacity, 2, 3), dtype),
        jnp.zeros((capacity,), dtype),
        jnp.zeros((capacity, 4), dtype),
        jnp.zeros((capacity, 4), dtype),
        jnp.zeros((capacity,), bool),
        jnp.zeros((capacity,), bool),
    )


def empty_graph(
    max_frames: int,
    max_drones: int,
    max_ranges: int = 4096,
    max_odoms: int = 1024,
    max_loops: int = 1024,
    max_dets: int = 1024,
) -> FactorGraph:
    return FactorGraph(
        ranges=empty_ranges(max_ranges),
        odoms=empty_relpose(max_odoms),
        loops=empty_relpose(max_loops),
        dets=empty_detections(max_dets),
        pose_valid=jnp.zeros((max_frames, max_drones), bool),
        pose_fixed=jnp.zeros((max_frames, max_drones), bool),
        yaw_fixed=jnp.zeros((max_frames, max_drones), bool),
    )


class GraphBuilder:
    """Host-side (numpy) accumulator producing a device FactorGraph.

    This is the bridge between the event-driven measurement world (simulator
    or live ingestion) and the batched solver. All add_* methods are cheap
    numpy writes; ``build()`` uploads once.
    """

    def __init__(self, max_frames: int, max_drones: int,
                 max_ranges: int = 4096, max_odoms: int = 1024,
                 max_loops: int = 1024, max_dets: int = 1024):
        self.F, self.D = max_frames, max_drones
        self.caps = dict(ranges=max_ranges, odoms=max_odoms,
                         loops=max_loops, dets=max_dets)
        self.ranges = []
        self.odoms = []
        self.loops = []
        self.dets = []
        self.pose_valid = np.zeros((max_frames, max_drones), bool)
        self.pose_fixed = np.zeros((max_frames, max_drones), bool)
        self.yaw_fixed = np.zeros((max_frames, max_drones), bool)
        self.ant_pos = None

    def set_antenna(self, drone: int, offset) -> None:
        """Per-drone UWB antenna offset in body frame (anntena_pos)."""
        if self.ant_pos is None:
            self.ant_pos = np.zeros((self.D, 3), np.float32)
        self.ant_pos[drone] = np.asarray(offset, np.float32)

    def set_pose_valid(self, frame: int, drone: int, fixed: bool = False):
        self.pose_valid[frame, drone] = True
        if fixed:
            self.pose_fixed[frame, drone] = True

    def add_range(self, frame: int, drone_a: int, drone_b: int,
                  dist: float, cov: float):
        self.ranges.append((frame, drone_a, drone_b, dist, 1.0 / np.sqrt(cov)))

    def add_odom(self, drone: int, frame_a: int, frame_b: int,
                 dpose, sqrt_info):
        self.odoms.append((frame_a, drone, frame_b, drone,
                           np.asarray(dpose, np.float32),
                           np.asarray(sqrt_info, np.float32)))

    def add_loop(self, frame_a: int, drone_a: int, frame_b: int, drone_b: int,
                 dpose, sqrt_info):
        self.loops.append((frame_a, drone_a, frame_b, drone_b,
                           np.asarray(dpose, np.float32),
                           np.asarray(sqrt_info, np.float32)))

    def add_detection(self, frame_a: int, drone_a: int, frame_b: int,
                      drone_b: int, direction, tangent_base, inv_dep: float,
                      dpose_a=None, dpose_b=None, enable_depth: bool = True):
        ident = np.zeros(4, np.float32)
        self.dets.append((
            frame_a, drone_a, frame_b, drone_b,
            np.asarray(direction, np.float32),
            np.asarray(tangent_base, np.float32),
            float(inv_dep),
            ident if dpose_a is None else np.asarray(dpose_a, np.float32),
            ident if dpose_b is None else np.asarray(dpose_b, np.float32),
            bool(enable_depth),
        ))

    def _relpose_arrays(self, rows, cap) -> RelPoseFactors:
        n = len(rows)
        assert n <= cap, f"relpose capacity exceeded: {n} > {cap}"
        fa = np.zeros(cap, np.int32)
        da = np.zeros(cap, np.int32)
        fb = np.zeros(cap, np.int32)
        db = np.zeros(cap, np.int32)
        dp = np.zeros((cap, 4), np.float32)
        si = np.zeros((cap, 4, 4), np.float32)
        valid = np.zeros(cap, bool)
        for i, (a, d1, b, d2, p, s) in enumerate(rows):
            fa[i], da[i], fb[i], db[i] = a, d1, b, d2
            dp[i], si[i] = p, s
            valid[i] = True
        return RelPoseFactors(*map(jnp.asarray, (fa, da, fb, db, dp, si, valid)))

    def build(self) -> FactorGraph:
        cap = self.caps["ranges"]
        n = len(self.ranges)
        assert n <= cap, f"range capacity exceeded: {n} > {cap}"
        rf = np.zeros(cap, np.int32)
        ra = np.zeros(cap, np.int32)
        rb = np.zeros(cap, np.int32)
        rd = np.zeros(cap, np.float32)
        ri = np.zeros(cap, np.float32)
        rv = np.zeros(cap, bool)
        for i, (f, a, b, d, s) in enumerate(self.ranges):
            rf[i], ra[i], rb[i], rd[i], ri[i], rv[i] = f, a, b, d, s, True
        ranges = RangeFactors(*map(jnp.asarray, (rf, ra, rb, rd, ri, rv)))

        cap = self.caps["dets"]
        n = len(self.dets)
        assert n <= cap, f"detection capacity exceeded: {n} > {cap}"
        fa = np.zeros(cap, np.int32)
        da = np.zeros(cap, np.int32)
        fb = np.zeros(cap, np.int32)
        db = np.zeros(cap, np.int32)
        dirs = np.zeros((cap, 3), np.float32)
        tb = np.zeros((cap, 2, 3), np.float32)
        invd = np.zeros(cap, np.float32)
        dpa = np.zeros((cap, 4), np.float32)
        dpb = np.zeros((cap, 4), np.float32)
        ed = np.zeros(cap, bool)
        dv = np.zeros(cap, bool)
        for i, row in enumerate(self.dets):
            fa[i], da[i], fb[i], db[i] = row[0], row[1], row[2], row[3]
            dirs[i], tb[i], invd[i], dpa[i], dpb[i], ed[i] = row[4:10]
            dv[i] = True
        dets = DetectionFactors(*map(jnp.asarray,
                                     (fa, da, fb, db, dirs, tb, invd, dpa, dpb, ed, dv)))

        return FactorGraph(
            ranges=ranges,
            odoms=self._relpose_arrays(self.odoms, self.caps["odoms"]),
            loops=self._relpose_arrays(self.loops, self.caps["loops"]),
            dets=dets,
            pose_valid=jnp.asarray(self.pose_valid),
            pose_fixed=jnp.asarray(self.pose_fixed),
            yaw_fixed=jnp.asarray(self.yaw_fixed),
            ant_pos=None if self.ant_pos is None
            else jnp.asarray(self.ant_pos),
        )


def diag_sqrt_info(pos_std: float, yaw_std: float, dtype=np.float32) -> np.ndarray:
    """Diagonal 4x4 sqrt information from position / yaw stddevs."""
    return np.diag([1.0 / pos_std] * 3 + [1.0 / yaw_std]).astype(dtype)


def sqrt_info_from_cov4(cov4: np.ndarray) -> np.ndarray:
    """Elementwise |inv(cov)|^0.5 — matches the reference's convention.

    RelativePoseFactor4d::CreateCov6d whitens with
    cov.inverse().cwiseAbs().cwiseSqrt() (factors.hpp:255-263), NOT a matrix
    square root; reproduced here for behavioral parity.
    """
    return np.sqrt(np.abs(np.linalg.inv(cov4)))
