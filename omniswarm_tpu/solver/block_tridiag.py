"""Batched block-tridiagonal SPD solver via cyclic reduction.

The swarm sliding-window Hessian is block-tridiagonal over frames: UWB
ranges and same-frame detections couple drones *within* a frame (diagonal
blocks of size m = D*4), the ego-motion chain couples consecutive frames
(off-diagonal blocks), and only loop closures break the pattern — they are
handled as a low-rank Woodbury correction by the caller (solver/dense.py).

Cyclic reduction eliminates odd frames in parallel at each of log2(F)
levels; every level is a handful of batched (F_l, m, m) matmuls and
factorizations — no (P, P) matrix ever exists. This is the TPU
speed-of-light replacement for sparse Cholesky: O(log F) sequential depth
instead of O(F), everything MXU-shaped.

Solves T x = rhs for SPD block-tridiagonal T given:
- A: (F, m, m) diagonal blocks,
- B: (F-1, m, m) upper off-diagonal blocks (B[f] couples f and f+1),
- rhs: (F, m, K) — K right-hand sides solved simultaneously (the Woodbury
  columns ride along with the gradient for free).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def _pad_pow2(A, B, rhs):
    F = A.shape[0]
    L = max(1, (F - 1).bit_length())
    Fp = 1 << L
    m = A.shape[1]
    if Fp != F:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), (Fp - F, m, m))
        A = jnp.concatenate([A, eye], 0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Fp - F,) + rhs.shape[1:], rhs.dtype)], 0)
    # B always padded to length Fp-1 with zeros (no coupling to pad frames)
    Bp = jnp.zeros((Fp - 1,) + B.shape[1:], B.dtype)
    if B.shape[0] > 0:
        Bp = Bp.at[: B.shape[0]].set(B)
    return A, Bp, rhs, F, Fp


def _solve_blocks(A, X):
    """Batched solve A_i Y_i = X_i for SPD blocks via Cholesky."""
    L = jax.lax.linalg.cholesky(A)
    Y = jax.lax.linalg.triangular_solve(L, X, left_side=True, lower=True,
                                        transpose_a=False)
    return jax.lax.linalg.triangular_solve(L, Y, left_side=True, lower=True,
                                           transpose_a=True)


def _dense_bt_solve(A, B, rhs):
    """Direct solve of a small block-tridiagonal system via one Cholesky."""
    Fl, m = A.shape[0], A.shape[1]
    dtype = A.dtype
    eye_f = jnp.eye(Fl, dtype=dtype)
    H = jnp.einsum("fij,fg->figj", A, eye_f)
    if Fl > 1:
        shift = jnp.eye(Fl, k=1, dtype=dtype)
        Bpad = jnp.concatenate([B, jnp.zeros((1, m, m), dtype)], 0)
        H = H + jnp.einsum("fij,fg->figj", Bpad, shift)
        H = H + jnp.einsum("fij,fg->gjfi", Bpad, shift)
    H = H.reshape(Fl * m, Fl * m)
    K = rhs.shape[-1]
    x = _solve_blocks(H[None], rhs.reshape(1, Fl * m, K))[0]
    return x.reshape(Fl, m, K)


def bt_solve(A: jnp.ndarray, B: jnp.ndarray, rhs: jnp.ndarray, *,
             direct_threshold: int = 8) -> jnp.ndarray:
    """Solve the block-tridiagonal SPD system; returns (F, m, K).

    Hybrid: cyclic reduction halves the frame count per level until at most
    ``direct_threshold`` blocks remain, then one small dense Cholesky
    finishes the job — trading a trivial amount of FLOPs for ~half the
    kernel launches (TPU levels are latency-bound at swarm sizes).
    """
    A, B, rhs, F_orig, F = _pad_pow2(A, B, rhs)
    m = A.shape[1]

    # Forward reduction: stack per-level data for back-substitution.
    levels: List[Tuple] = []
    while A.shape[0] > max(1, direct_threshold):
        Fl = A.shape[0]
        A_odd = A[1::2]                              # (Fl/2, m, m)
        # Solve A_odd^{-1} against everything it multiplies.
        B_left = B[0::2]                             # couples 2t ↔ 2t+1
        # B_right couples 2t+1 ↔ 2t+2 (zero for the last odd block)
        B_right = jnp.zeros_like(B_left)
        if Fl > 2:
            B_right = B_right.at[:-1].set(B[1::2])
        rhs_odd = rhs[1::2]

        Ainv_Blt = _solve_blocks(A_odd, jnp.swapaxes(B_left, -1, -2))
        Ainv_Br = _solve_blocks(A_odd, B_right)
        Ainv_r = _solve_blocks(A_odd, rhs_odd)

        A_even = A[0::2]
        rhs_even = rhs[0::2]
        # A'[t] = A[2t] - B[2t-1]^T Ainv[2t-1] B[2t-1] - B[2t] Ainv[2t+1] B[2t]^T
        corr_right = jnp.einsum("tij,tjk->tik", B_left, Ainv_Blt)
        # left correction for t>0 uses odd block 2t-1 = odd index t-1
        corr_left = jnp.einsum("tji,tjk->tik",
                               B_right, Ainv_Br)      # B^T Ainv B at odd t
        A_new = A_even - corr_right
        A_new = A_new.at[1:].add(-corr_left[:-1])
        # B'[t] couples 2t ↔ 2t+2: -B[2t] Ainv[2t+1] B[2t+1]
        B_new = -jnp.einsum("tij,tjk->tik", B_left, Ainv_Br)[:-1]
        # rhs'[t] = rhs[2t] - B[2t] Ainv[2t+1] rhs[2t+1]
        #                  - B[2t-1]^T Ainv[2t-1] rhs[2t-1]
        r_new = rhs_even - jnp.einsum("tij,tjk->tik", B_left, Ainv_r)
        r_new = r_new.at[1:].add(
            -jnp.einsum("tji,tjk->tik", B_right, Ainv_r)[:-1])

        levels.append((A_odd, B_left, B_right, rhs_odd))
        A, B, rhs = A_new, B_new, r_new

    x = _dense_bt_solve(A, B, rhs)                   # (F_l, m, K)

    # Back-substitution.
    for A_odd, B_left, B_right, rhs_odd in reversed(levels):
        # x currently holds even-frame solutions of this level.
        x_even = x
        # x[2t+1] = Ainv[2t+1] (rhs[2t+1] - B[2t]^T x[2t] - B[2t+1] x[2t+2])
        r = rhs_odd - jnp.einsum("tji,tjk->tik", B_left, x_even)
        x_shift = jnp.concatenate(
            [x_even[1:], jnp.zeros_like(x_even[:1])], 0)
        r = r - jnp.einsum("tij,tjk->tik", B_right, x_shift)
        x_odd = _solve_blocks(A_odd, r)
        Fl2 = x_even.shape[0]
        x = jnp.zeros((2 * Fl2,) + x_even.shape[1:], x_even.dtype)
        x = x.at[0::2].set(x_even)
        x = x.at[1::2].set(x_odd)

    return x[:F_orig]
