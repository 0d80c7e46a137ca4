"""Cyclic-reduction block-tridiagonal solver vs dense reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.solver.block_tridiag import bt_solve


def random_spd_tridiag(rng, F, m, K=2):
    A = np.zeros((F, m, m))
    B = rng.normal(size=(F - 1, m, m)) * 0.3
    for f in range(F):
        M = rng.normal(size=(m, m))
        A[f] = M @ M.T + (m + 4) * np.eye(m)   # strongly diag-dominant SPD
    rhs = rng.normal(size=(F, m, K))
    return A.astype(np.float32), B.astype(np.float32), rhs.astype(np.float32)


def dense_of(A, B):
    F, m, _ = A.shape
    H = np.zeros((F * m, F * m))
    for f in range(F):
        H[f * m:(f + 1) * m, f * m:(f + 1) * m] = A[f]
    for f in range(F - 1):
        H[f * m:(f + 1) * m, (f + 1) * m:(f + 2) * m] = B[f]
        H[(f + 1) * m:(f + 2) * m, f * m:(f + 1) * m] = B[f].T
    return H


@pytest.mark.parametrize("F", [1, 2, 3, 5, 8, 13, 100])
def test_bt_solve_matches_dense(rng, F):
    m, K = 8, 3
    A, B, rhs = random_spd_tridiag(rng, F, m, K)
    x = np.asarray(bt_solve(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs)))
    H = dense_of(A, B)
    x_ref = np.linalg.solve(H, rhs.transpose(1, 0, 2).reshape(F * m, K)
                            if False else rhs.reshape(F * m, K))
    x_ref = x_ref.reshape(F, m, K)
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_bt_solve_swarm_sized(rng):
    F, m, K = 100, 20, 5
    A, B, rhs = random_spd_tridiag(rng, F, m, K)
    x = np.asarray(bt_solve(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs)))
    H = dense_of(A, B)
    x_ref = np.linalg.solve(H, rhs.reshape(F * m, K)).reshape(F, m, K)
    np.testing.assert_allclose(x, x_ref, rtol=5e-3, atol=5e-3)


def test_pack_bt_repartition_exact():
    """Packing p frames per block is a pure re-partition: solves agree."""
    import numpy as np

    from omniswarm_tpu.solver.block_tridiag import (
        bt_solve, pack_bt_cols, pack_bt_mats, unpack_bt_cols)

    rng = np.random.default_rng(0)
    F, m, K = 11, 4, 3                      # deliberately not divisible by p
    A = np.zeros((F, m, m), np.float32)
    for f in range(F):
        X = rng.normal(size=(m, m)).astype(np.float32)
        A[f] = X @ X.T + 4.0 * np.eye(m)
    B = 0.3 * rng.normal(size=(F - 1, m, m)).astype(np.float32)
    rhs = rng.normal(size=(F, m, K)).astype(np.float32)

    x_ref = np.asarray(bt_solve(jnp.asarray(A), jnp.asarray(B),
                                jnp.asarray(rhs)))
    for p in (2, 4):
        Ap, Bp, F_true = pack_bt_mats(jnp.asarray(A), jnp.asarray(B), p)
        assert F_true == F
        rp = pack_bt_cols(jnp.asarray(rhs), p)
        xp = bt_solve(Ap, Bp, rp)
        x = np.asarray(unpack_bt_cols(xp, p, F))
        np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


def test_lm_solve_bt_packed_matches_unpacked():
    import numpy as np

    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import dense_graph_from_sim, lm_solve_bt

    data = sim.generate(sim.SimParams(num_drones=3, num_frames=40, seed=7))
    graph = dense_graph_from_sim(data)
    init = jnp.asarray(data.vio, jnp.float32)
    r1 = lm_solve_bt(graph, init, max_iterations=25, pack=1)
    r4 = lm_solve_bt(graph, init, max_iterations=25, pack=4)
    c1, c4 = float(r1.cost), float(r4.cost)
    assert np.isfinite(c1) and np.isfinite(c4)
    assert abs(c1 - c4) / max(c1, 1e-9) < 2e-3, (c1, c4)
