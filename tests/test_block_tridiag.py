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
