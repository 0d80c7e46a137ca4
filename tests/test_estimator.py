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


def _hover_two_drone_world(offset, n=20, seed=3, step=0.06):
    """Two hovering drones whose local VIO frames differ by ``offset``.

    Returns (times, vio0, vio1_local, gt1_world): drone 1's VIO lives in
    its own local frame; its world pose is offset ∘ local.
    """
    from omniswarm_tpu.sim.simulator import pose_mul_np

    rng = np.random.default_rng(seed)
    times = 10.0 + np.arange(n, dtype=float)
    # small random walks (below init_xy_movement so motion can't init)
    def walk():
        steps = rng.normal(0, step, size=(n, 4))
        steps[:, 3] *= 0.1
        return np.cumsum(steps, axis=0)
    vio0 = walk()
    vio1_local = walk()
    gt1_world = pose_mul_np(np.broadcast_to(offset, (n, 4)), vio1_local)
    return times, vio0, vio1_local, gt1_world


def test_loop_seeded_init_large_offset():
    """init_pose_by_loops parity (solver.cpp:218-268, :786,:802-806):
    two hovering drones whose local frames differ by ~20 m and a yaw flip
    must converge via loop-seeded init — the ±2 m random-jitter basin
    cannot reach the true offset, and the motion box never unlocks
    random init."""
    from omniswarm_tpu.sim.simulator import delta_pose_np

    offset = np.array([20.0, 5.0, 0.0, 2.5])
    times, vio0, vio1_local, gt1_world = _hover_two_drone_world(offset)
    n = len(times)
    rng = np.random.default_rng(7)

    est = SwarmEstimator(SolverParams(
        self_id=0, kf_movement=0.01, pcm_redundant=True,
        loop_outlier_distance_threshold=50.0))
    for k in range(n):
        vio = {0: vio0[k], 1: vio1_local[k]}
        ranges = {(0, 1): float(
            np.linalg.norm(vio0[k][:3] - gt1_world[k][:3])
            + rng.normal(0, 0.05))}
        est.on_swarm_frame(float(times[k]), vio, ranges)
    # a handful of inter-drone loops (true relative pose + small noise)
    for k in (2, 6, 10, 14):
        dp = delta_pose_np(vio0[k], gt1_world[k]) + rng.normal(0, 0.01, 4)
        est.on_loop(LoopRecord(t_a=float(times[k]), drone_a=0,
                               t_b=float(times[k]), drone_b=1,
                               dpose=dp, pos_std=0.05, yaw_std=0.02))

    assert not est._motion_ok or not est.finish_init
    out = est.solve()
    assert out["solved"], out
    assert not est._motion_ok  # motion box never initialized this
    # drone-1 world positions recovered to sub-meter despite the 20 m
    # offset: only the loop-seeded lane can have found this basin
    idmap = {d: i for i, d in enumerate(est.window_ids)}
    kf_idx = [int(round(kf.t - times[0])) for kf in est.window]
    err = np.linalg.norm(
        est.estimate[:len(kf_idx), idmap[1], :3]
        - gt1_world[kf_idx][:, :3], axis=-1)
    assert float(np.median(err)) < 1.0, (np.median(err), out)


def test_loop_seeded_init_grid_values():
    """_loop_seeded_init composes the target column exactly: seeded pose
    of the target drone equals source ∘ loop ∘ own-ego-delta at every
    frame (init_pose_by_loop, solver.cpp:236-268)."""
    from omniswarm_tpu.sim.simulator import delta_pose_np, pose_mul_np

    offset = np.array([-8.0, 12.0, 1.0, -1.2])
    times, vio0, vio1_local, gt1_world = _hover_two_drone_world(offset, n=12)
    est = SwarmEstimator(SolverParams(
        self_id=0, kf_movement=0.01, loop_outlier_distance_threshold=50.0))
    for k in range(len(times)):
        est.on_swarm_frame(float(times[k]),
                           {0: vio0[k], 1: vio1_local[k]}, {})
    k0 = 4
    dp = delta_pose_np(vio0[k0], gt1_world[k0])      # noise-free loop
    est.on_loop(LoopRecord(t_a=float(times[k0]), drone_a=0,
                           t_b=float(times[k0]), drone_b=1,
                           dpose=dp, pos_std=0.05, yaw_std=0.02))
    idmap = {d: i for i, d in enumerate(est._drone_ids())}
    est.window_ids = list(est._drone_ids())
    F = len(est.window)
    init = np.zeros((F, 2, 4), np.float32)
    for fi, kf in enumerate(est.window):
        for d, pose in kf.vio.items():
            init[fi, idmap[d]] = pose
    seeded = est._loop_seeded_init(init, idmap)
    assert seeded is not None
    # self column untouched
    np.testing.assert_allclose(seeded[:, idmap[0]], init[:, idmap[0]])
    # target column equals the true world pose of drone 1 (loop is exact,
    # VIO deltas are exact in this construction)
    np.testing.assert_allclose(
        seeded[:F, idmap[1]], gt1_world[:F], atol=1e-4)
