"""Fused Pallas reduction level vs the pure-XLA bt_factor level."""
import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.solver.block_tridiag import ns_inverse_warm
from omniswarm_tpu.solver.pallas_level import fused_reduction_level


def _xla_level(A, B, X0):
    """The bt_factor level body (block_tridiag.py) in its XLA form."""
    Fl = A.shape[0]
    A_odd = A[1::2]
    B_left = B[0::2]
    B_right = jnp.zeros_like(B_left)
    if Fl > 2:
        B_right = B_right.at[:-1].set(B[1::2])
    Ainv = ns_inverse_warm(A_odd, X0, 2)
    W_l = jnp.einsum("tij,tjk->tik", B_left, Ainv)
    W_r = jnp.einsum("tji,tjk->tik", B_right, Ainv)
    A_new = A[0::2] - jnp.einsum("tij,tkj->tik", W_l, B_left)
    A_new = A_new.at[1:].add(
        -jnp.einsum("tij,tjk->tik", W_r, B_right)[:-1])
    B_new = -jnp.einsum("tij,tjk->tik", W_l, B_right)[:-1]
    return Ainv, B_left, B_right, W_l, W_r, A_new, B_new


def _random_level(rng, Fl, m):
    A = np.zeros((Fl, m, m), np.float32)
    for f in range(Fl):
        X = rng.normal(size=(m, m)).astype(np.float32)
        A[f] = X @ X.T + 3.0 * np.eye(m)
    B = 0.25 * rng.normal(size=(Fl - 1, m, m)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(B)


def test_fused_level_matches_xla():
    rng = np.random.default_rng(0)
    for Fl, m in ((8, 8), (16, 16)):
        A, B = _random_level(rng, Fl, m)
        # warm starts: slightly perturbed true inverses (the LM steady
        # state) so the guard takes the warm branch
        X0 = jnp.linalg.inv(A[1::2]) * (1 + 1e-3)
        ref = _xla_level(A, B, X0)
        got = fused_reduction_level(A, B, X0)
        for r, g, name in zip(ref, got, ("Ainv", "B_left", "B_right",
                                         "W_l", "W_r", "A_new", "B_new")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_level_guard_fallback():
    """A garbage warm start must take the Jacobi-fallback branch in both
    implementations identically."""
    rng = np.random.default_rng(1)
    A, B = _random_level(rng, 8, 8)
    X0 = 100.0 * jnp.ones((4, 8, 8), jnp.float32)     # guard trips
    ref = _xla_level(A, B, X0)
    got = fused_reduction_level(A, B, X0)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)
