"""Frame-sharded SPIKE block-tridiagonal solve vs the single-device solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.parallel.bt_spike import (
    pad_for_mesh,
    spike_solve,
)
from omniswarm_tpu.solver.block_tridiag import bt_matvec, bt_solve


def random_spd_bt(F, m, K, seed=0, dtype=jnp.float32):
    """SPD block-tridiagonal system: T = chain J^T J + diagonal boost."""
    rng = np.random.default_rng(seed)
    A = np.zeros((F, m, m), np.float64)
    B = rng.normal(0, 0.3, size=(F - 1, m, m))
    for f in range(F):
        Q = rng.normal(size=(m, m))
        A[f] = Q @ Q.T / m + 3.0 * np.eye(m)
    # diagonal dominance over the couplings keeps T SPD
    for f in range(F - 1):
        s = np.abs(B[f]).sum()
        A[f] += np.eye(m) * s / m
        A[f + 1] += np.eye(m) * s / m
    rhs = rng.normal(size=(F, m, K))
    return (jnp.asarray(A, dtype), jnp.asarray(B, dtype),
            jnp.asarray(rhs, dtype))


def make_mesh(n):
    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"needs {n} devices")
    from jax.sharding import Mesh
    return Mesh(np.asarray(devices[:n]), ("frames",))


@pytest.mark.parametrize("F,m,K,nd", [(64, 8, 5, 8), (128, 12, 3, 4),
                                      (96, 8, 1, 8)])
def test_spike_matches_bt_solve(F, m, K, nd):
    mesh = make_mesh(nd)
    A, B, rhs = random_spd_bt(F, m, K, seed=F + m)
    x_ref = bt_solve(A, B, rhs)
    x = spike_solve(A, B, rhs, mesh)
    err = float(jnp.max(jnp.abs(x - x_ref)) / jnp.max(jnp.abs(x_ref)))
    assert err < 2e-4, err


def test_spike_residual_exact():
    mesh = make_mesh(8)
    F, m, K = 64, 8, 4
    A, B, rhs = random_spd_bt(F, m, K, seed=3)
    x = spike_solve(A, B, rhs, mesh)
    r = bt_matvec(A, B, x) - rhs
    rel = float(jnp.max(jnp.abs(r)) / jnp.max(jnp.abs(rhs)))
    assert rel < 1e-4, rel


def test_spike_padding():
    mesh = make_mesh(8)
    F, m, K = 50, 8, 3                       # 50 % 8 != 0 → pad to 56
    A, B, rhs = random_spd_bt(F, m, K, seed=9)
    Ap, Bp, rhsp, F_orig = pad_for_mesh(A, B, rhs, 8)
    assert Ap.shape[0] % 8 == 0 and F_orig == F
    x = spike_solve(Ap, Bp, rhsp, mesh)[:F]
    x_ref = bt_solve(A, B, rhs)
    err = float(jnp.max(jnp.abs(x - x_ref)) / jnp.max(jnp.abs(x_ref)))
    assert err < 2e-4, err


def test_spike_single_shard_degenerate():
    mesh = make_mesh(1)
    F, m, K = 32, 8, 2
    A, B, rhs = random_spd_bt(F, m, K, seed=5)
    x = spike_solve(A, B, rhs, mesh)
    x_ref = bt_solve(A, B, rhs)
    err = float(jnp.max(jnp.abs(x - x_ref)) / jnp.max(jnp.abs(x_ref)))
    assert err < 1e-5, err
