"""Equivalence of the vectorized fast build vs the generic python build.

build_dense_fast must reproduce the exact factor content of
SwarmEstimator._build + dense_from_factor_graph whenever the window
structure fits the dense layout, and fall back (return None) when it
doesn't. Randomized scenarios cover ranges+gating, loop anchoring with
PCM and same-pair averaging, detections, static anchors, antenna offsets
and per-pair UWB calibration.
"""
import numpy as np
import pytest

from omniswarm_tpu.config import NodeConfig, SolverParams
from omniswarm_tpu.swarm.estimator import (
    DetRecord, LoopRecord, SwarmEstimator)
from omniswarm_tpu.swarm.fastbuild import build_dense_fast


def _feed_scenario(est, *, drones=4, frames=20, seed=0, loops=True,
                   dets=True, dup_loops=True, gap_drone=None,
                   with_estimate=False):
    rng = np.random.default_rng(seed)
    t0 = 100.0
    truth = {d: np.array([d * 0.6, -0.4 * d, 0.1 * d, 0.1 * d]) for d in
             range(drones)}
    for i in range(frames):
        t = t0 + i
        vio = {}
        for d in range(drones):
            if gap_drone is not None and d == gap_drone and i in (7, 8):
                continue
            truth[d] = truth[d] + np.array(
                [0.8 + 0.1 * rng.normal(), 0.1 * rng.normal(),
                 0.05 * rng.normal(), 0.02 * rng.normal()])
            vio[d] = truth[d] + rng.normal(0, 0.01, 4)
        ranges = {}
        for a in range(drones):
            for b in range(drones):
                if a < b and a in vio and b in vio and rng.random() < 0.8:
                    ranges[(a, b)] = float(np.linalg.norm(
                        vio[a][:3] - vio[b][:3])) + rng.normal(0, 0.05)
        est.on_swarm_frame(t, vio, ranges)
    if loops:
        for k in range(12):
            a, b = rng.choice(drones, 2, replace=False)
            ta = t0 + float(rng.integers(2, frames - 1))
            tb = t0 + float(rng.integers(2, frames - 1))
            pa = est._ego_pose_at(int(a), ta)
            pb = est._ego_pose_at(int(b), tb)
            if pa is None or pb is None:
                continue
            from omniswarm_tpu.sim.simulator import delta_pose_np
            dp = delta_pose_np(pa, pb) + rng.normal(0, 0.01, 4)
            est.on_loop(LoopRecord(t_a=ta, drone_a=int(a), t_b=tb,
                                   drone_b=int(b), dpose=dp,
                                   pos_std=0.05, yaw_std=0.02))
            if dup_loops and k % 3 == 0:
                # same keyframe pair, distinct measurement identity (0.3 s
                # offset beats the centisecond ingest dedup but anchors to
                # the same nearest keyframes)
                est.on_loop(LoopRecord(
                    t_a=ta + 0.3, drone_a=int(a), t_b=tb, drone_b=int(b),
                    dpose=dp + rng.normal(0, 0.005, 4),
                    pos_std=0.08, yaw_std=0.03))
    if dets:
        for k in range(6):
            a, b = rng.choice(drones, 2, replace=False)
            t = t0 + float(rng.integers(2, frames - 1))
            pa = est._ego_pose_at(int(a), t)
            pb = est._ego_pose_at(int(b), t)
            if pa is None or pb is None:
                continue
            diff = pb[:3] - pa[:3]
            dist = np.linalg.norm(diff) + 1e-6
            est.on_detection(DetRecord(
                t=t, drone_a=int(a), drone_b=int(b),
                direction=diff / dist, inv_dep=1.0 / dist,
                enable_depth=bool(k % 2)))
    if with_estimate:
        # plausible estimate so the UWB outlier gate has something to use
        F = len(est.window)
        D = len(est._drone_ids())
        grid = est._vio_grid({d: i for i, d in
                              enumerate(est._drone_ids())})
        est.estimate = grid + rng.normal(0, 0.02, grid.shape).astype(
            np.float32)
        est.window_ids = est._drone_ids()


def _slow_dense(est):
    from omniswarm_tpu.solver.dense import dense_from_factor_graph

    graph, init, idmap = est._build()
    return dense_from_factor_graph(graph), init, idmap


def _assert_graph_equal(fast, slow, *, atol=1e-5):
    import jax

    fl = fast._asdict()
    sl = slow._asdict()
    assert set(fl) == set(sl)
    for k in fl:
        f, s = fl[k], sl[k]
        if f is None or s is None:
            assert f is None and s is None, k
            continue
        if k == "loops":
            for name in f._fields:
                fa, sa = np.asarray(getattr(f, name)), np.asarray(
                    getattr(s, name))
                assert fa.shape == sa.shape, (k, name, fa.shape, sa.shape)
                assert np.allclose(fa, sa, atol=atol), (
                    k, name, np.abs(fa.astype(float)
                                    - sa.astype(float)).max())
            continue
        fa, sa = np.asarray(f), np.asarray(s)
        assert fa.shape == sa.shape, (k, fa.shape, sa.shape)
        assert np.allclose(fa, sa, atol=atol), (
            k, np.abs(fa.astype(float) - sa.astype(float)).max())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("redundant", [True, False])
def test_fast_build_matches_slow(seed, redundant):
    p = SolverParams(self_id=0, max_frame_number=64, kf_movement=0.2,
                     loop_outlier_distance_threshold=50.0,
                     pcm_redundant=redundant)
    est = SwarmEstimator(p, rng_seed=seed)
    _feed_scenario(est, seed=seed, with_estimate=True)
    est._prune_stale()
    fast = build_dense_fast(est)
    assert fast is not None
    fg, finit, fidmap = fast
    sg, sinit, sidmap = _slow_dense(est)
    assert sg is not None
    assert fidmap == sidmap
    assert np.allclose(finit, sinit, atol=1e-6)
    _assert_graph_equal(fg, sg)


def test_fast_build_static_node_antenna_and_calibration():
    nc = {
        0: NodeConfig(drone_id=0, antenna_pos=(0.1, 0.0, 0.05),
                      uwb_bias={1: 0.3}, uwb_scale={1: 1.02}),
        2: NodeConfig(drone_id=2, is_static=True),
        3: NodeConfig(drone_id=3, has_vo=False),
    }
    p = SolverParams(self_id=0, max_frame_number=64, kf_movement=0.2,
                     loop_outlier_distance_threshold=50.0)
    est = SwarmEstimator(p, node_configs=nc)
    _feed_scenario(est, seed=3)
    est._prune_stale()
    fast = build_dense_fast(est)
    assert fast is not None
    fg, finit, fidmap = fast
    sg, sinit, sidmap = _slow_dense(est)
    assert sg is not None
    assert fidmap == sidmap
    assert np.allclose(finit, sinit, atol=1e-6)
    _assert_graph_equal(fg, sg)
    # static node: zero-motion prior rows present
    c2 = fidmap[2]
    assert np.asarray(fg.odom_valid)[:, c2].any()
    assert np.allclose(np.asarray(fg.odom_sqrt_info)[
        np.asarray(fg.odom_valid)[:, c2], c2], 1e3)
    # has_vo=False: no odom rows at all
    c3 = fidmap[3]
    assert not np.asarray(fg.odom_valid)[:, c3].any()
    assert fg.ant_pos is not None


def test_fast_build_gap_falls_back():
    p = SolverParams(self_id=0, max_frame_number=64, kf_movement=0.2)
    est = SwarmEstimator(p)
    _feed_scenario(est, seed=4, gap_drone=2, loops=False, dets=False)
    est._prune_stale()
    assert build_dense_fast(est) is None


def test_fast_build_debug_no_rejection():
    p = SolverParams(self_id=0, max_frame_number=64, kf_movement=0.2,
                     loop_outlier_distance_threshold=50.0,
                     debug_no_rejection=True)
    est = SwarmEstimator(p)
    _feed_scenario(est, seed=5)
    est._prune_stale()
    fg, finit, fidmap = build_dense_fast(est)
    sg, sinit, sidmap = _slow_dense(est)
    assert fidmap == sidmap
    _assert_graph_equal(fg, sg)
    # pass-through: duplicate loops NOT fused
    assert int(np.asarray(fg.loops.valid).sum()) == \
        int(np.asarray(sg.loops.valid).sum())


def test_grids_track_eviction_and_new_drones():
    p = SolverParams(self_id=0, max_frame_number=10, kf_movement=0.2,
                     enable_random_keyframe_deletion=True)
    est = SwarmEstimator(p)
    rng = np.random.default_rng(6)
    pose = {d: np.array([d * 1.0, 0, 0, 0.0]) for d in range(3)}
    for i in range(30):
        vio = {}
        for d in range(3 if i > 10 else 2):    # drone 2 appears later
            pose[d] = pose[d] + np.array([0.5, 0.05 * rng.normal(), 0, 0])
            vio[d] = pose[d] + rng.normal(0, 0.01, 4)
        ranges = {(0, 1): float(np.linalg.norm(
            vio[0][:3] - vio[1][:3]))}
        est.on_swarm_frame(100.0 + i, vio, ranges)
    g = est._grids
    assert g.nrows == len(est.window)
    # grids must equal a from-scratch rebuild
    from omniswarm_tpu.swarm.fastbuild import WindowGrids
    ref = WindowGrids()
    ref.rebuild(est.window)
    assert ref.ids == g.ids
    assert np.allclose(ref.times, g.times)
    assert np.allclose(ref.poses, g.poses)
    assert np.array_equal(ref.valid, g.valid)
    assert np.allclose(ref.rng_dist, g.rng_dist)
    assert np.array_equal(ref.rng_valid, g.rng_valid)


def test_end_to_end_solve_fast_vs_slow():
    """Full solve() through both build paths lands on the same cost."""
    results = {}
    for fast in (True, False):
        p = SolverParams(self_id=0, max_frame_number=64, kf_movement=0.2,
                         loop_outlier_distance_threshold=50.0,
                         fast_build=fast, publish_covariance=False)
        est = SwarmEstimator(p, rng_seed=0)
        _feed_scenario(est, seed=7)
        r = est.solve()
        assert r["solved"], r
        results[fast] = (r["cost"], est.estimate.copy())
    c_fast, e_fast = results[True]
    c_slow, e_slow = results[False]
    assert np.isfinite(c_fast)
    assert abs(c_fast - c_slow) <= 5e-3 * max(abs(c_slow), 1e-9)
    assert np.allclose(e_fast, e_slow, atol=5e-3)


@pytest.mark.slow
def test_host_build_under_budget_at_1024kf():
    """VERDICT r3 item 1 'done' gate: prepare_solve host work at a
    1,024-keyframe, 5-drone, 2,000-loop window stays under budget.

    The CI bound (150 ms on the 2-core box, which also runs the PCM mask
    jit on CPU) is ~4x the measured warm cost (~35 ms); the TPU-side
    artifact (tools/online_window_bench.py -> ONLINE_1024.json) records
    the production number.
    """
    import time

    from omniswarm_tpu.sim.simulator import delta_pose_np

    p = SolverParams(self_id=0, max_frame_number=1024, kf_movement=0.05,
                     loop_outlier_distance_threshold=50.0,
                     publish_covariance=False)
    est = SwarmEstimator(p, rng_seed=0)
    rng = np.random.default_rng(0)
    pose = {d: np.array([0.0, 1.5 * d, 0, 0]) for d in range(5)}
    for i in range(1024):
        vio = {}
        for d in range(5):
            pose[d] = pose[d] + np.array(
                [0.1, 0.02 * rng.normal(), 0, 0.002 * rng.normal()])
            vio[d] = pose[d] + rng.normal(0, 0.01, 4)
        ranges = {(a, b): float(np.linalg.norm(vio[a][:3] - vio[b][:3]))
                  + rng.normal(0, 0.05)
                  for a in range(5) for b in range(a + 1, 5)}
        est.on_swarm_frame(100.0 + i, vio, ranges)
    for k in range(2000):
        a, b = rng.choice(5, 2, replace=False)
        ta = 100.0 + float(rng.integers(2, 1023))
        tb = 100.0 + float(rng.integers(2, 1023))
        pa = est._ego_pose_at(int(a), ta)
        pb = est._ego_pose_at(int(b), tb)
        dp = delta_pose_np(pa, pb) + rng.normal(0, 0.01, 4)
        est.on_loop(LoopRecord(t_a=ta, drone_a=int(a), t_b=tb,
                               drone_b=int(b), dpose=dp,
                               pos_std=0.05, yaw_std=0.02))
    est.prepare_solve()        # warm (jit compile of the PCM mask bucket)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        prep = est.prepare_solve()
        times.append((time.perf_counter() - t0) * 1e3)
    assert not prep.get("refused")
    assert prep["dense_graph"] is not None     # fast path, not fallback
    med = sorted(times)[len(times) // 2]
    assert med < 150.0, times
