"""Decentralized PCM inlier-set exchange over the bus."""
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import FrontendParams, SolverParams
from omniswarm_tpu.swarm.comm import LossyBus
from omniswarm_tpu.swarm.estimator import LoopRecord, loop_key
from omniswarm_tpu.swarm.node import DroneNode


def test_loop_key_canonical():
    lp1 = LoopRecord(t_a=1.0, drone_a=2, t_b=3.0, drone_b=0,
                     dpose=np.zeros(4), pos_std=0.1, yaw_std=0.1)
    lp2 = LoopRecord(t_a=3.0, drone_a=0, t_b=1.0, drone_b=2,
                     dpose=np.zeros(4), pos_std=0.1, yaw_std=0.1)
    assert loop_key(lp1) == loop_key(lp2)


def test_inlier_sets_propagate():
    D, F = 3, 25
    data = sim.generate(sim.SimParams(
        num_drones=D, num_frames=F, seed=71, loop_every=2,
        loop_outlier_rate=0.3, loop_outlier_mag=4.0))
    bus = LossyBus(seed=1)
    sp = SolverParams(pcm_redundant=False, max_iterations=40)
    nodes = [DroneNode(d, bus, solver_params=SolverParams(
        pcm_redundant=False, max_iterations=40)) for d in range(D)]

    # feed frames + sim loop edges directly (no visual frontend here)
    for k in range(F):
        t = float(data.times[k])
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in range(D) for b in range(D)
                  if a != b and data.range_valid[k, a, b]}
        for node in nodes:
            node.on_swarm_frame(t, vio, ranges)
    for lp in data.loops:
        rec = LoopRecord(
            t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
            t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
            dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std)
        for node in nodes:
            node.estimator.on_loop(rec)

    # node 0 solves → computes + broadcasts inlier sets for its pairs
    nodes[0].solve(t=99.0)
    assert nodes[0].estimator.pair_inliers, "node 0 computed no inlier sets"
    bus.step(100.0)
    # peers received the (0, x) pair sets they don't compute themselves
    got = nodes[1].estimator.external_inliers
    assert any(0 in pair for pair in got), got
    # received sets contain plausible loop keys
    for pair, keys in got.items():
        for k in keys:
            assert len(k) == 4
    # node 1 can solve using adopted sets
    out = nodes[1].solve(t=101.0)
    assert out["solved"]
