"""Yaw-observability freezing + cutting_edges redundancy pruning.

VERDICT r4 item 5: drive yaw_fixed from the observability analysis and
port the not-moved distance-edge pruning. Reference semantics:
- yaw_observability is true for drones in the loop/detection BFS set from
  self (swarm_localization_solver.cpp:1370-1374) or whose own in-window
  xy extent exceeds THRES_YAW_OBSER_XY (:1413-1420); loop/det factors are
  gated on BOTH endpoints being yaw-observable (:1066-1068).
- cutting_edges (:1225-1296) prunes a range between a mutually non-moving
  pair (the shipped reference has the pruning commented out, so our knob
  defaults off).
"""
import numpy as np

from omniswarm_tpu.config import SolverParams
from omniswarm_tpu.swarm.estimator import LoopRecord, SwarmEstimator
from omniswarm_tpu.swarm.fastbuild import build_dense_fast


def _params(**kw):
    base = dict(self_id=0, max_frame_number=64, kf_movement=0.05,
                init_xy_movement=1.0, init_z_movement=0.05,
                loop_outlier_distance_threshold=50.0,
                enable_random_keyframe_deletion=False)
    base.update(kw)
    return SolverParams(**base)


def _feed(est, frames=12, move=(0.0, 0.0, 0.0), n_drones=2,
          mover_id=0, hover_at=None):
    """Self (id 0 by default) spirals to unlock motion-init; drone
    ``mover_id`` moves by ``move`` per frame; everyone else hovers."""
    hover_at = hover_at or {}
    for i in range(frames):
        t = 10.0 + i
        vio = {}
        for d in range(n_drones):
            if d == 0:
                vio[0] = np.array([0.3 * i, 0.25 * i, 0.1 * i, 0.01 * i])
            elif d == mover_id:
                vio[d] = np.array([3.0 + move[0] * i, -2.0 + move[1] * i,
                                   0.5 + move[2] * i, 0.3])
            else:
                base = hover_at.get(d, (3.0 + d, -2.0, 0.5))
                vio[d] = np.array([*base, 0.3])
        ranges = {}
        for a in range(n_drones):
            for b in range(a + 1, n_drones):
                ranges[(a, b)] = float(
                    np.linalg.norm(vio[a][:3] - vio[b][:3]))
        est.on_swarm_frame(t, vio, ranges)


def _col(est, d):
    return est._drone_ids().index(d)


def test_hovering_range_only_drone_yaw_frozen():
    """A range-only hovering drone is position-solvable through motion
    init but its yaw column must be frozen — in BOTH build paths."""
    est = SwarmEstimator(_params(), rng_seed=0)
    _feed(est, mover_id=1, move=(0.0, 0.0, 0.0))
    graph, _, idmap = est._build()
    c0, c1 = idmap[0], idmap[1]
    yf = np.asarray(graph.yaw_fixed)
    pv = np.asarray(graph.pose_valid)
    pf = np.asarray(graph.pose_fixed)
    assert not yf[:, c0].any()                     # self: yaw observable
    assert yf[pv[:, c1], c1].all()                 # hover drone: frozen yaw
    assert not pf[pv[:, c1], c1].all()             # ... but pos is FREE

    fast = build_dense_fast(est)
    assert fast is not None
    fg, _, fidmap = fast
    assert fidmap == idmap
    np.testing.assert_array_equal(np.asarray(fg.yaw_fixed)[:yf.shape[0]],
                                  yf)


def test_moving_range_only_drone_yaw_free():
    """>1 m of own xy motion makes yaw observable through the ranges
    (THRES_YAW_OBSER_XY sweep, solver.cpp:1413-1420)."""
    est = SwarmEstimator(_params(), rng_seed=0)
    _feed(est, mover_id=1, move=(0.25, 0.0, 0.0))   # ~2.8 m x extent
    graph, _, idmap = est._build()
    yf = np.asarray(graph.yaw_fixed)
    assert not yf[:, idmap[1]].any()


def test_loop_connected_drone_yaw_free():
    """A hovering drone with a verified loop to self joins the BFS set
    and keeps yaw free (loop_observable_set, solver.cpp:1299-1334)."""
    est = SwarmEstimator(_params(), rng_seed=0)
    _feed(est, mover_id=1, move=(0.0, 0.0, 0.0))
    t = 14.0
    pa = est._ego_pose_at(0, t)
    pb = est._ego_pose_at(1, t)
    from omniswarm_tpu.sim.simulator import delta_pose_np
    est.on_loop(LoopRecord(t_a=t, drone_a=0, t_b=t, drone_b=1,
                           dpose=delta_pose_np(pa, pb),
                           pos_std=0.05, yaw_std=0.02))
    graph, _, idmap = est._build()
    yf = np.asarray(graph.yaw_fixed)
    assert not yf[:, idmap[1]].any()
    # and the loop factor itself survived the yaw gate
    assert int(np.asarray(graph.loops.valid).sum()) == 1


def test_disconnected_pair_loop_gated():
    """A loop between two drones neither of which connects to self is
    dropped by the yaw gate (solver.cpp:1066-1068) in both builders."""
    est = SwarmEstimator(_params(), rng_seed=0)
    _feed(est, n_drones=3, mover_id=1, move=(0.0, 0.0, 0.0),
          hover_at={2: (5.0, -3.0, 0.8)})
    t = 14.0
    pa = est._ego_pose_at(1, t)
    pb = est._ego_pose_at(2, t)
    from omniswarm_tpu.sim.simulator import delta_pose_np
    est.on_loop(LoopRecord(t_a=t, drone_a=1, t_b=t, drone_b=2,
                           dpose=delta_pose_np(pa, pb),
                           pos_std=0.05, yaw_std=0.02))
    graph, _, _ = est._build()
    assert int(np.asarray(graph.loops.valid).sum()) == 0
    fg, _, _ = build_dense_fast(est)
    assert int(np.asarray(fg.loops.valid).sum()) == 0


def _count_pair_ranges(graph, ca, cb):
    v = np.asarray(graph.ranges.valid)
    da = np.asarray(graph.ranges.drone_a)[v]
    db = np.asarray(graph.ranges.drone_b)[v]
    lo, hi = min(ca, cb), max(ca, cb)
    return int((((da == lo) & (db == hi))
                | ((da == hi) & (db == lo))).sum())


def test_cutting_edges_collapses_static_pair():
    """With cutting_edges on, a mutually static pair keeps only its first
    frame's range; pairs with a moving endpoint keep every frame. Default
    (off) keeps everything — parity with the shipped reference."""
    for cutting, expect_static_pair_all in ((False, True), (True, False)):
        est = SwarmEstimator(_params(cutting_edges=cutting), rng_seed=0)
        _feed(est, n_drones=3, mover_id=0,
              hover_at={1: (3.0, -2.0, 0.5), 2: (5.0, -3.0, 0.8)})
        graph, _, idmap = est._build()
        F = len(est.window)
        n_12 = _count_pair_ranges(graph, idmap[1], idmap[2])
        n_01 = _count_pair_ranges(graph, idmap[0], idmap[1])
        assert n_01 == F          # moving endpoint: never pruned
        if expect_static_pair_all:
            assert n_12 == F
        else:
            assert n_12 == 1      # collapsed to the first frame

        # dense fast path agrees
        fg, _, _ = build_dense_fast(est)
        rv = np.asarray(fg.range_valid)
        n_12_fast = int(rv[:, idmap[1], idmap[2]].sum()
                        + rv[:, idmap[2], idmap[1]].sum())
        assert n_12_fast == n_12
