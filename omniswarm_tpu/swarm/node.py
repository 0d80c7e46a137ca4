"""Per-drone node: frontend + network + detector + estimator, wired.

The counterpart of the reference's SwarmLoop node + swarm_localization node
running together on one drone (swarm_loop.cpp:204-335 wiring LoopCam →
LoopNet → LoopDetector, swarm_localization_node.cpp subscriptions): every
drone runs an identical DroneNode; the only coupling between nodes is the
multicast bus (keyframes + loop edges + PCM inlier sets) and the UWB
range/odometry frames — faithful decentralization semantics, testable fully
in-process over a LossyBus.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from omniswarm_tpu.config import FrontendParams, SolverParams
from omniswarm_tpu.swarm.comm import (
    InlierSetPacket,
    KeyframeData,
    LoopEdgePacket,
    LoopNet,
)
from omniswarm_tpu.swarm.estimator import LoopRecord, SwarmEstimator
from omniswarm_tpu.swarm.loop_detector import LoopDetector


class DroneNode:
    def __init__(self, drone_id: int, bus, *,
                 solver_params: Optional[SolverParams] = None,
                 frontend_params: Optional[FrontendParams] = None,
                 node_configs=None, global_dim: int = 4096, seed: int = 0):
        self.drone_id = drone_id
        sp = solver_params or SolverParams()
        sp.self_id = drone_id
        self.estimator = SwarmEstimator(sp, node_configs=node_configs,
                                        rng_seed=seed)
        self.detector = LoopDetector(drone_id, frontend_params,
                                     global_dim=global_dim, seed=seed)
        self.net = LoopNet(bus, drone_id,
                           on_keyframe=self._on_remote_keyframe,
                           on_loop=self._on_loop_edge,
                           on_inliers=self._on_inlier_set)
        self.loops_found = 0
        self.loops_received = 0

    # ------------------------------------------------------------------
    def on_swarm_frame(self, t: float, vio: Dict[int, np.ndarray],
                       ranges: Dict[Tuple[int, int], float]) -> bool:
        return self.estimator.on_swarm_frame(t, vio, ranges)

    def on_local_keyframe(self, kf: KeyframeData, t: float) -> None:
        """A keyframe from this drone's own camera/frontend."""
        cand = self.detector.on_keyframe(kf)
        self.net.broadcast_keyframe(kf, t)
        if cand is not None:
            self.loops_found += 1
            self._ingest_loop(cand.edge)
            self.net.broadcast_loop_edge(cand.edge, t)

    def step(self, t: float) -> None:
        """Periodic comm scan (the reference's 100 Hz timer)."""
        self.net.scan_recv_packets(t)

    def solve(self, t: float = 0.0):
        out = self.estimator.solve()
        # broadcast the PCM inlier sets this node computed (LOOP_INLIERS
        # division of labor: peers adopt instead of recomputing,
        # swarm_outlier_rejection.cpp:73-96)
        for pair, keys in self.estimator.pair_inliers.items():
            self.net.broadcast_inlier_set(
                InlierSetPacket(drone_a=pair[0], drone_b=pair[1],
                                loop_keys=sorted(keys)), t)
        return out

    # ------------------------------------------------------------------
    def _on_remote_keyframe(self, kf: KeyframeData) -> None:
        cand = self.detector.on_keyframe(kf)
        if cand is not None:
            self.loops_found += 1
            self._ingest_loop(cand.edge)
            self.net.broadcast_loop_edge(cand.edge, kf.t)

    def _on_loop_edge(self, pkt: LoopEdgePacket) -> None:
        self.loops_received += 1
        self._ingest_loop(pkt)

    def _on_inlier_set(self, pkt: InlierSetPacket) -> None:
        pair = (min(pkt.drone_a, pkt.drone_b), max(pkt.drone_a, pkt.drone_b))
        if self.drone_id in pair:
            return                      # we compute our own pairs
        self.estimator.external_inliers[pair] = {
            tuple(k) for k in pkt.loop_keys}

    def _ingest_loop(self, edge: LoopEdgePacket) -> None:
        self.estimator.on_loop(LoopRecord(
            t_a=edge.t_a, drone_a=edge.drone_a,
            t_b=edge.t_b, drone_b=edge.drone_b,
            dpose=np.asarray(edge.dpose, float),
            pos_std=edge.pos_std, yaw_std=edge.yaw_std))
