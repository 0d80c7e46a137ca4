"""Anonymous-detection data association end-to-end (VERDICT r1 item 8).

Mirrors the reference simulator's estimate-dependent anonymous-ID semantics
(swarm_local_sim.cpp:429-431: a detection carries ``i*1000+j``-style
anonymous IDs until the observer's estimate of the target is good) flowing
through the full decentralized stack: DroneNode detection intake → DA-init
DFS re-identification (enable_data_association) → sliding-window solve.
"""
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.robust.da_init import ANONYMOUS_ID_BASE
from omniswarm_tpu.swarm.comm import LossyBus
from omniswarm_tpu.swarm.estimator import DetRecord
from omniswarm_tpu.swarm.node import DroneNode


def bearing_from(gt, k, a, b, rng):
    pa, pb = gt[k, a], gt[k, b]
    c, s = np.cos(-pa[3]), np.sin(-pa[3])
    d = pb[:3] - pa[:3]
    rel = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
    n = np.linalg.norm(rel)
    u = rel / n + rng.normal(0, 0.004, 3)
    return u / np.linalg.norm(u), 1.0 / n


def run_system(enable_da: bool):
    D, F = 3, 25
    rng = np.random.default_rng(4)
    data = sim.generate(sim.SimParams(
        num_drones=D, num_frames=F, seed=61,
        radius_range=(2.0, 4.0), z_range=(0.8, 2.0)))
    bus = LossyBus(seed=1)
    node = DroneNode(0, bus, solver_params=SolverParams(
        enable_data_association=enable_da, pcm_redundant=True,
        max_iterations=60, init_z_movement=0.05,
        da_accept_thres=3.345))

    n_solved = 0
    for k in range(F):
        t = float(data.times[k])
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {(a, b): float(data.ranges[k, a, b])
                  for a in range(D) for b in range(D)
                  if a != b and data.range_valid[k, a, b]}
        node.on_swarm_frame(t, vio, ranges)

        # estimate-dependent anonymous IDs (swarm_local_sim.cpp:429-431):
        # a target stays anonymous until this node's current estimate of it
        # is within 0.5 m of truth
        for target in (1, 2):
            u, idep = bearing_from(data.gt, k, 0, target, rng)
            pred = node.estimator.predict(target, t)
            known = (pred is not None
                     and np.linalg.norm(pred[:3] - data.gt[k, target, :3])
                     < 0.5)
            det_id = target if known else ANONYMOUS_ID_BASE + 100 + target
            node.on_detection(DetRecord(
                t=t, drone_a=0, drone_b=det_id, direction=u, inv_dep=idep))

        if k >= 8 and k % 4 == 0:
            out = node.solve(t)
            n_solved += int(bool(out.get("solved")))

    out = node.solve(float(data.times[-1]))
    est = node.estimator
    kf_idx = [int(round(kf.t / data.params.dt)) for kf in est.window]
    rel_ate = None
    if out.get("solved") and est.estimate is not None:
        rel_ate = metrics.mean_relative_ate(est.estimate, data.gt[kf_idx])
    return node, out, rel_ate


def test_da_resolves_anonymous_and_improves_ate():
    node_da, out_da, ate_da = run_system(enable_da=True)
    assert out_da["solved"], out_da

    # anonymous detections were re-identified to the true targets
    resolved = [d for d in node_da.estimator.dets
                if d.drone_b < ANONYMOUS_ID_BASE]
    anon_left = [d for d in node_da.estimator.dets
                 if d.drone_b >= ANONYMOUS_ID_BASE]
    assert len(resolved) >= 10, (len(resolved), len(anon_left))
    for d in resolved:
        assert d.drone_b in (1, 2)

    # without DA the anonymous detections are unusable: the DA run must not
    # be worse, and must have strictly more usable detection factors
    node_no, out_no, ate_no = run_system(enable_da=False)
    resolved_no = [d for d in node_no.estimator.dets
                   if d.drone_b < ANONYMOUS_ID_BASE]
    assert len(resolved) > len(resolved_no)
    assert ate_da is not None
    if ate_no is not None:
        assert ate_da <= ate_no * 1.25, (ate_da, ate_no)
    assert ate_da < 0.30, ate_da
