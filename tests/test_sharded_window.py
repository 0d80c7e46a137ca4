"""Frame-sharded window LM vs the single-device production solver."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from omniswarm_tpu import sim
from omniswarm_tpu.parallel.sharded_window import (
    _assemble_sharded,
    _graph_specs,
    lm_solve_bt_sharded,
    pad_graph_frames,
)
from omniswarm_tpu.solver.dense import (
    assemble_blocks,
    dense_graph_from_sim,
    lm_solve_bt,
)


def make_mesh(n):
    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devices[:n]), ("frames",))


@pytest.fixture(scope="module")
def problem():
    params = sim.SimParams(num_drones=4, num_frames=48, seed=2)
    data = sim.generate(params)
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    return graph, init


def test_sharded_assembly_matches_dense(problem):
    graph, poses = problem
    mesh = make_mesh(8)
    g8, poses8, F = pad_graph_frames(graph, poses, 8)

    def wrapped(g, poses):
        A, B, gf, U, cost, _B_left = _assemble_sharded(
            g, poses, axis="frames", huber_delta=1.0, det_sphere_std=0.1,
            det_inv_dep_std=0.5)
        return A, B, gf, U, cost[None]

    fn = jax.jit(
        jax.shard_map(
            wrapped,
            mesh=mesh,
            in_specs=(_graph_specs(g8, "frames"), P("frames")),
            out_specs=(P("frames"), P("frames"), P("frames"), P("frames"),
                       P("frames")),
            check_vma=False,
        )
    )
    A_s, B_s, g_s, U_s, cost_parts = fn(g8, poses8)

    Fp = g8.pose_valid.shape[0]
    g_ref = g8._replace(odom_dpose=g8.odom_dpose[:Fp - 1],
                        odom_sqrt_info=g8.odom_sqrt_info[:Fp - 1],
                        odom_valid=g8.odom_valid[:Fp - 1])
    A_d, B_d, g_d, U_d, cost_d = assemble_blocks(g_ref, poses8)
    np.testing.assert_allclose(np.asarray(A_s), np.asarray(A_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(B_s[:-1]), np.asarray(B_d),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.max(jnp.abs(B_s[-1]))) == 0.0
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_d),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.sum(cost_parts)) == pytest.approx(float(cost_d),
                                                       rel=1e-5)


@pytest.mark.parametrize("nd", [2, 8])
def test_sharded_lm_matches_bt(problem, nd):
    graph, init = problem
    mesh = make_mesh(nd)
    res_ref = lm_solve_bt(graph, init, max_iterations=30,
                          exact_linear=True)
    res_sh = lm_solve_bt_sharded(graph, init, mesh, max_iterations=30)
    c_ref = float(res_ref.cost)
    c_sh = float(res_sh.cost)
    assert np.isfinite(c_sh)
    assert c_sh < float(res_sh.initial_cost)
    assert abs(c_sh - c_ref) / max(c_ref, 1e-9) < 5e-3, (c_sh, c_ref)
    # solutions agree where the solve is well-conditioned
    err = np.max(np.abs(np.asarray(res_sh.poses) - np.asarray(res_ref.poses)))
    assert err < 0.05, err


def test_sharded_lm_padding_path(problem):
    graph, init = problem                   # F=48 → pads to 48 (div by 8)
    mesh = make_mesh(8)
    # force non-divisible: drop 3 frames
    import dataclasses

    F = 45
    g2 = graph._replace(
        range_dist=graph.range_dist[:F], range_valid=graph.range_valid[:F],
        odom_dpose=graph.odom_dpose[:F - 1],
        odom_sqrt_info=graph.odom_sqrt_info[:F - 1],
        odom_valid=graph.odom_valid[:F - 1],
        det_dir=graph.det_dir[:F], det_tb=graph.det_tb[:F],
        det_invdep=graph.det_invdep[:F], det_valid=graph.det_valid[:F],
        det_has_depth=graph.det_has_depth[:F],
        pose_valid=graph.pose_valid[:F], pose_fixed=graph.pose_fixed[:F],
        yaw_fixed=graph.yaw_fixed[:F],
        loops=graph.loops._replace(
            valid=graph.loops.valid & (graph.loops.frame_a < F)
            & (graph.loops.frame_b < F)),
    )
    res = lm_solve_bt_sharded(g2, init[:F], mesh, max_iterations=20)
    assert res.poses.shape[0] == F
    assert np.isfinite(float(res.cost))
    assert float(res.cost) < float(res.initial_cost)
