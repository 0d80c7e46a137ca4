"""Block-tridiagonal+Woodbury LM must match the dense-H LM."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.solver.dense import (
    assemble_blocks,
    assemble_dense,
    dense_graph_from_sim,
    lm_solve_bt,
    lm_solve_dense,
)


@pytest.fixture(scope="module")
def problem():
    data = sim.generate(sim.SimParams(num_drones=4, num_frames=20, seed=31))
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    return data, graph, init


def test_blocks_match_dense_H(problem):
    data, graph, init = problem
    F, D = graph.pose_valid.shape
    m = 4 * D
    Hd, gd, cd = assemble_dense(graph, init)
    A, B, g, U, c = assemble_blocks(graph, init)
    np.testing.assert_allclose(float(c), float(cd), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g).reshape(-1), np.asarray(gd),
                               rtol=1e-3, atol=1e-3)
    # reconstruct the full H from blocks: T + U U^T
    P = F * m
    H = np.zeros((P, P), np.float32)
    A_, B_, U_ = map(np.asarray, (A, B, U))
    for f in range(F):
        H[f * m:(f + 1) * m, f * m:(f + 1) * m] = A_[f]
    for f in range(F - 1):
        H[f * m:(f + 1) * m, (f + 1) * m:(f + 2) * m] = B_[f]
        H[(f + 1) * m:(f + 2) * m, f * m:(f + 1) * m] = B_[f].T
    Uf = U_.reshape(P, -1)
    H += Uf @ Uf.T
    # masked diagonal differs by construction only in unit entries
    np.testing.assert_allclose(H, np.asarray(Hd), rtol=2e-3, atol=2e-2)


def test_bt_lm_matches_dense_lm(problem):
    data, graph, init = problem
    rd = lm_solve_dense(graph, init, max_iterations=50)
    rb = lm_solve_bt(graph, init, max_iterations=50)
    np.testing.assert_allclose(float(rb.cost), float(rd.cost), rtol=2e-2)
    rel_d = metrics.mean_relative_ate(np.asarray(rd.poses), data.gt)
    rel_b = metrics.mean_relative_ate(np.asarray(rb.poses), data.gt)
    assert rel_b < 0.08, rel_b
    assert abs(rel_b - rel_d) < 0.02, (rel_b, rel_d)


def test_bt_lm_five_drone_100kf():
    data = sim.generate(sim.SimParams(num_drones=5, num_frames=100, seed=0))
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    res = lm_solve_bt(graph, init, max_iterations=60)
    rel = metrics.mean_relative_ate(np.asarray(res.poses), data.gt)
    assert rel < 0.08, (rel, float(res.cost))


def test_bt_batched_matches_single(problem):
    from omniswarm_tpu.solver.dense import lm_solve_bt_batched

    data, graph, init = problem
    rng = np.random.default_rng(0)
    B = 3
    inits = np.tile(np.asarray(init)[None], (B, 1, 1, 1))
    inits[1, :, 1:, :3] += rng.normal(0, 0.3, size=(20, 3, 3))
    inits[2, :, 1:, :3] += rng.normal(0, 0.6, size=(20, 3, 3))
    rb = lm_solve_bt_batched(graph, jnp.asarray(inits), max_iterations=40)
    for b in range(B):
        rs = lm_solve_bt(graph, jnp.asarray(inits[b]), max_iterations=40)
        np.testing.assert_allclose(float(rb.cost[b]), float(rs.cost),
                                   rtol=0.05, atol=0.5)
    rel = metrics.mean_relative_ate(np.asarray(rb.poses[0]), data.gt)
    assert rel < 0.08, rel


def test_pcg_linear_matches_smw(problem):
    """linear="pcg" (sparse-loop BT-preconditioned CG) reaches the same
    optimum as the exact Woodbury path — the large-L production path
    (the (4L,4L) capacitance is O(L^3)/iter; sparse CG is O(L))."""
    data, graph, init = problem
    smw = lm_solve_bt(graph, init, max_iterations=50, linear="smw")
    pcg = lm_solve_bt(graph, init, max_iterations=50, linear="pcg")
    assert np.isfinite(float(pcg.cost))
    np.testing.assert_allclose(float(pcg.cost), float(smw.cost),
                               rtol=5e-3)
    rel = metrics.mean_relative_ate(np.asarray(pcg.poses),
                                    np.asarray(smw.poses))
    assert rel < 0.02, rel


def test_pcg_sparse_matvec_matches_dense_U(problem):
    """The sparse loop Hessian application equals U U^T v exactly."""
    import jax

    from omniswarm_tpu.solver.dense import SparseLoops

    data, graph, init = problem
    A, B, g, U, c = assemble_blocks(graph, init)
    A2, B2, g2, sl, c2 = assemble_blocks(graph, init, loops_dense=False)
    np.testing.assert_allclose(float(c2), float(c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-5)
    assert isinstance(sl, SparseLoops)
    F, m = np.asarray(A).shape[:2]
    rng = np.random.default_rng(5)
    v = rng.normal(size=(F, m)).astype(np.float32)
    Ud = np.asarray(U)
    want = np.einsum("fmc,c->fm", Ud,
                     np.einsum("fmc,fm->c", Ud, v))
    vf = v.reshape(-1)
    ja, jb = np.asarray(sl.ja), np.asarray(sl.jb)
    ra, rb = np.asarray(sl.rows_a), np.asarray(sl.rows_b)
    t = (np.einsum("kci,ki->kc", ja, vf[ra])
         + np.einsum("kci,ki->kc", jb, vf[rb]))
    add = np.zeros_like(vf)
    np.add.at(add, ra.reshape(-1),
              np.einsum("kci,kc->ki", ja, t).reshape(-1))
    np.add.at(add, rb.reshape(-1),
              np.einsum("kci,kc->ki", jb, t).reshape(-1))
    np.testing.assert_allclose(add.reshape(F, m), want, atol=2e-3)
    # loop-term diagonal matches the dense row sums
    np.testing.assert_allclose(np.asarray(sl.diag),
                               np.einsum("fmc,fmc->fm", Ud, Ud), atol=2e-3)
