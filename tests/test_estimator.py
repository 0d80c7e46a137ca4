"""Online sliding-window estimator: ingestion, solving, prediction, re-init."""
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.swarm import DetRecord, LoopRecord, SwarmEstimator


def feed_sim(est: SwarmEstimator, data: sim.SimData, upto: int):
    """Feed sim frames [0, upto) into the estimator."""
    D = data.gt.shape[1]
    for k in range(upto):
        vio = {d: data.vio[k, d] for d in range(D)}
        ranges = {}
        for a in range(D):
            for b in range(D):
                if a != b and data.range_valid[k, a, b]:
                    ranges[(a, b)] = float(data.ranges[k, a, b])
        est.on_swarm_frame(float(data.times[k]), vio, ranges)
    for lp in data.loops:
        if lp.frame_a < upto and lp.frame_b < upto:
            est.on_loop(LoopRecord(
                t_a=float(data.times[lp.frame_a]), drone_a=lp.drone_a,
                t_b=float(data.times[lp.frame_b]), drone_b=lp.drone_b,
                dpose=lp.dpose, pos_std=lp.pos_std, yaw_std=lp.yaw_std))
    for det in data.detections:
        if det.frame < upto:
            est.on_detection(DetRecord(
                t=float(data.times[det.frame]), drone_a=det.drone_a,
                drone_b=det.drone_b, direction=det.direction,
                inv_dep=det.inv_dep))


@pytest.fixture(scope="module")
def data():
    return sim.generate(sim.SimParams(num_drones=4, num_frames=30, seed=21))


def test_keyframe_admission(data):
    est = SwarmEstimator(SolverParams(self_id=0))
    feed_sim(est, data, 30)
    # moving drones at >=0.5 m/frame: nearly all frames admitted
    assert 10 <= len(est.window) <= 30


def test_solve_and_accuracy(data):
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 30)
    out = est.solve()
    assert out["solved"] and est.finish_init, out
    F = len(est.window)
    # compare estimate to GT at the window keyframes
    kf_idx = [int(round(kf.t)) for kf in est.window]
    gt = data.gt[kf_idx]
    rel = metrics.mean_relative_ate(est.estimate, gt)
    assert rel < 0.15, (rel, out)


def test_window_eviction():
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=40, seed=22))
    est = SwarmEstimator(SolverParams(self_id=0, max_frame_number=15))
    feed_sim(est, data, 40)
    assert len(est.window) <= 15


def test_prediction_follows_vio(data):
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 25)
    est.solve()
    # predict at a time after the last keyframe using newer VIO
    for k in range(25, 30):
        for d in range(data.gt.shape[1]):
            est.on_vio(float(data.times[k]), d, data.vio[k, d])
    pred = est.predict_swarm(float(data.times[29]))
    assert len(pred) >= 3
    for d, pose in pred.items():
        err = np.linalg.norm(pose[:3] - data.gt[29, d, :3])
        assert err < 0.6, (d, err)


def test_reinit_on_high_cost(data):
    p = SolverParams(self_id=0, acpt_cost=1e-9)  # impossible acceptance
    est = SwarmEstimator(p)
    feed_sim(est, data, 20)
    out = est.solve()
    assert out["solved"]
    assert not est.finish_init          # cost gate must trigger re-init


def test_base_coordinates(data):
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 30)
    est.solve()
    bc = est.base_coordinates()
    assert set(bc) == set(est.window_ids)
    # self drone's offset should be ~identity (it is anchored to its VIO)
    np.testing.assert_allclose(bc[0][:3], 0.0, atol=0.3)


def test_predict_relative_frame(data):
    est = SwarmEstimator(SolverParams(self_id=0, pcm_redundant=True))
    feed_sim(est, data, 25)
    est.solve()
    rel = est.predict_swarm_relative(float(data.times[24]))
    assert 0 in rel
    np.testing.assert_allclose(rel[0], 0.0, atol=1e-6)   # self is origin
    # relative estimates approximate GT relative poses
    for d, pose in rel.items():
        if d == 0:
            continue
        gt_rel = np.linalg.norm(data.gt[24, d, :3] - data.gt[24, 0, :3])
        est_rel = np.linalg.norm(pose[:3])
        assert abs(est_rel - gt_rel) < 0.5, (d, est_rel, gt_rel)


def test_loop_dedup_and_stale_pruning():
    """Rebroadcast loop edges dedup by key; records predating the window
    are pruned (the reference's all_loops grows without bound)."""
    from omniswarm_tpu.swarm.estimator import LoopRecord

    est = SwarmEstimator(SolverParams(max_frame_number=5, kf_movement=0.01,
                                      enable_random_keyframe_deletion=False))
    lp = LoopRecord(t_a=1.0, drone_a=0, t_b=1.0, drone_b=1,
                    dpose=np.array([1.0, 0, 0, 0]), pos_std=0.1, yaw_std=0.05)
    est.on_loop(lp)
    est.on_loop(LoopRecord(t_a=1.0, drone_a=0, t_b=1.0, drone_b=1,
                           dpose=np.array([1.0, 0, 0, 0]),
                           pos_std=0.1, yaw_std=0.05))
    assert len(est.loops) == 1          # duplicate key dropped

    for i in range(20):
        est.on_swarm_frame(float(i), {0: np.array([i * 1.0, 0, 0, 0.0]),
                                      1: np.array([i * 1.0, 2, 0, 0.0])}, {})
    est._prune_stale()
    # the t=1.0 loop now predates the 5-frame window (t=15..19)
    assert len(est.loops) == 0
    assert len(est._loop_keys) == 0
    # ego histories also trimmed
    assert est.ego[0][0][0] >= est.window[0].t - 2.0


def test_same_pair_loops_averaged():
    """K loops joining the same keyframe pair fuse into ONE factor whose
    strength is ~that of a single measurement, not K of them
    (average_same_loop parity, solver.cpp:1555-1592 — see
    estimator._average_same_pair for the deliberate cov semantics)."""
    from omniswarm_tpu.sim.simulator import invert_pose_np
    from omniswarm_tpu.swarm.estimator import _average_same_pair

    fwd1 = np.array([1.0, 0.0, 0.0, 0.10])
    fwd2 = np.array([1.2, 0.0, 0.0, 0.12])
    mid = np.array([1.1, 0.0, 0.0, 0.11])
    anchored = [
        (0, 0, 5, 1, fwd1, 0.1, 0.05),
        (0, 0, 5, 1, fwd2, 0.1, 0.05),
        # same physical pair, stored in the reverse orientation
        (5, 1, 0, 0, invert_pose_np(mid), 0.1, 0.05),
    ]
    out = _average_same_pair(anchored)
    assert len(out) == 1
    fa, da, fb, db, dp, ps, ys = out[0]
    assert (fa, da, fb, db) == (0, 0, 5, 1)
    np.testing.assert_allclose(dp, mid, atol=1e-6)
    # equal weights: combined std equals the single-measurement std —
    # duplicate evidence must NOT tighten the pair sqrt(K)-fold
    assert abs(ps - 0.1) < 1e-9 and abs(ys - 0.05) < 1e-9
    # distinct pairs stay untouched and ordered
    anchored.append((2, 0, 7, 1, fwd1, 0.2, 0.1))
    out2 = _average_same_pair(anchored)
    assert len(out2) == 2 and out2[1][:4] == (2, 0, 7, 1)


def test_duplicate_loops_do_not_tighten_estimate():
    """End-to-end: rebroadcasting the same loop K times with jittered
    timestamps (so the pair-canonical dedup can't catch it) yields the
    same number of solver loop factors as one loop."""
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=5,
                                      loop_every=50))
    base = SolverParams(self_id=0, pcm_enable=False)

    def build_with_dup(k):
        est = SwarmEstimator(base)
        feed_sim(est, data, 20)
        for j in range(k):
            est.on_loop(LoopRecord(
                t_a=float(data.times[2]) + 0.03 * j, drone_a=0,
                t_b=float(data.times[10]), drone_b=1,
                dpose=np.array([1.0, 0.5, 0.0, 0.1]) + 0.01 * j,
                pos_std=0.05, yaw_std=0.02))
        graph, _, _ = est._build()
        return int(np.asarray(graph.loops.valid).sum())

    assert build_with_dup(4) == build_with_dup(1)
