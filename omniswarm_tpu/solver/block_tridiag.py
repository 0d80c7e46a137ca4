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

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from omniswarm_tpu.core.precision import highp


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


@highp
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


# ---------------------------------------------------------------------------
# Frame packing: p frames -> one fat block
# ---------------------------------------------------------------------------
#
# The cyclic-reduction levels are latency-bound at swarm block sizes: a
# (t, 20, 20) level runs a fixed ~15-op chain whose per-op cost is dominated
# by dispatch latency and (24, 128)-tile padding waste, so the factor stage
# measured ~flat per LEVEL and the F=1024 window paid 8 levels of it
# (4.7 ms — the r2 superlinear-window finding). Packing p consecutive
# frames into one (p*m, p*m) block is a pure re-partition of the SAME
# block-tridiagonal matrix: log2(p) fewer levels, blocks near the 128-lane
# tile width, and all level plumbing amortized over p^2 x the payload.


def pack_bt_mats(A: jnp.ndarray, B: jnp.ndarray,
                 p: int) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Re-partition (A (F, m, m), B (F-1, m, m)) into fat (p*m) blocks.

    Returns (A' (F', pm, pm), B' (F'-1, pm, pm), F) with F' = ceil(F/p);
    trailing pad frames carry identity diagonals (no coupling), exactly
    like _pad_pow2.
    """
    F, m = A.shape[0], A.shape[1]
    Fp = -(-F // p) * p
    if Fp != F:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), (Fp - F, m, m))
        A = jnp.concatenate([A, eye], 0)
    Bfull = jnp.zeros((Fp, m, m), A.dtype)
    if B.shape[0] > 0:
        Bfull = Bfull.at[: B.shape[0]].set(B)
    K = Fp // p
    A4 = A.reshape(K, p, m, m)
    B4 = Bfull.reshape(K, p, m, m)              # B4[k, i] = B[p*k + i]
    idx = jnp.arange(p)
    blocks = jnp.zeros((K, p, p, m, m), A.dtype)
    blocks = blocks.at[:, idx, idx].set(A4)
    if p > 1:
        blocks = blocks.at[:, idx[:-1], idx[:-1] + 1].set(B4[:, :-1])
        blocks = blocks.at[:, idx[:-1] + 1, idx[:-1]].set(
            jnp.swapaxes(B4[:, :-1], -1, -2))
    Ap = blocks.transpose(0, 1, 3, 2, 4).reshape(K, p * m, p * m)
    Bp = jnp.zeros((max(K - 1, 0), p, p, m, m), A.dtype)
    if K > 1:
        Bp = Bp.at[:, p - 1, 0].set(B4[:-1, p - 1])
    Bp = Bp.transpose(0, 1, 3, 2, 4).reshape(max(K - 1, 0), p * m, p * m)
    return Ap, Bp, F


def pack_bt_cols(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(F, m, K) column stack -> (F', p*m, K); zero-padded trailing frames."""
    F, m, K = x.shape
    Fp = -(-F // p) * p
    if Fp != F:
        x = jnp.concatenate(
            [x, jnp.zeros((Fp - F, m, K), x.dtype)], 0)
    return x.reshape(Fp // p, p * m, K)


def unpack_bt_cols(x: jnp.ndarray, p: int, F: int) -> jnp.ndarray:
    """(F', p*m, K) -> (F, m, K)."""
    Kp, pm, K = x.shape
    m = pm // p
    return x.reshape(Kp * p, m, K)[:F]


# ---------------------------------------------------------------------------
# Matmul-only path: Newton-Schulz block inverses + iterative refinement
# ---------------------------------------------------------------------------
#
# The Cholesky/triangular_solve custom calls above process the tiny (m, m)
# blocks serially inside the custom call (measured: batch-flat scaling on
# v5e). This path replaces every per-level factorization with an explicit
# approximate inverse computed by diagonally-preconditioned Newton-Schulz
# iteration — nothing but batched matmuls, which the MXU pipelines across
# the whole (levels x batch) block population. The approximation error of
# the resulting solve operator M^-1 ~= T^-1 is removed by 1-2 passes of
# iterative refinement against the *exact* block-tridiagonal matvec
# (x += M^-1 (rhs - T x)), each pass contracting the error by ~|I - M^-1 T|.


@highp
def ns_inverse(A: jnp.ndarray, iters: int = 12,
               bf16_head: int = 0) -> jnp.ndarray:
    """Approximate batched SPD inverse, pure matmuls.

    Diagonal Jacobi scaling An = S A S (unit diagonal) tightens the spectrum,
    then Newton-Schulz X <- X (2I - An X) from the safe start X0 = I/rho with
    rho >= lambda_max(An) (row-sum bound) converges quadratically. Symmetric
    by induction. Returns S X S ~= A^-1.

    bf16_head > 0 runs that many leading iterations in bfloat16 (1/6 the
    MXU cost of 3-pass f32): bf16 stalls at ~cond*4e-3, and each trailing
    f32 iteration then squares the residual — 2 f32 iterations after a
    bf16 head match the full-f32 result to ~1e-3.
    """
    n = A.shape[-1]
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    An = A * s[..., :, None] * s[..., None, :]
    rho = jnp.max(jnp.sum(jnp.abs(An), -1), -1)          # >= lambda_max
    eye = jnp.eye(n, dtype=A.dtype)
    X = eye / rho[..., None, None]
    two_eye = 2.0 * eye
    if bf16_head:
        Anb = An.astype(jnp.bfloat16)
        Xb = X.astype(jnp.bfloat16)
        tb = two_eye.astype(jnp.bfloat16)
        for _ in range(bf16_head):
            Xb = (Xb @ (tb - Anb @ Xb)).astype(jnp.bfloat16)
        X = Xb.astype(A.dtype)
    for _ in range(iters):
        X = X @ (two_eye - An @ X)
    return X * s[..., :, None] * s[..., None, :]


@highp
def ns_inverse_warm(A: jnp.ndarray, X0: jnp.ndarray, iters: int = 2,
                    guard: float = 0.95) -> jnp.ndarray:
    """Newton-Schulz continued from a previous inverse of a nearby matrix.

    NS contracts iff rho(I - A X0) < 1; across LM iterations the damped
    Hessian blocks change by O(step), so the previous level inverses are
    excellent starting points and ``iters``~3 squarings reach f32 noise
    (error e -> e^(2^iters)). A per-block guard (row-sum norm of the NS
    residual, an upper bound on the spectral radius) falls back to the safe
    Jacobi start I/rho for any block where the warm start would diverge —
    those blocks then keep contracting across subsequent LM iterations,
    because the returned X seeds the next call (NS becomes one continued
    iteration threaded through the outer loop).
    """
    n = A.shape[-1]
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    An = A * s[..., :, None] * s[..., None, :]
    eye = jnp.eye(n, dtype=A.dtype)
    # previous inverse rescaled into the new Jacobi frame: X0n ~= An^-1
    X0n = X0 / jnp.maximum(s[..., :, None] * s[..., None, :], 1e-30)
    # the guard residual M = An X0n doubles as the first NS iteration's
    # inner product, so the check costs no extra matmul; fallback blocks
    # use the Jacobi start whose product An/rho is elementwise
    M = An @ X0n
    enorm = jnp.max(jnp.sum(jnp.abs(eye - M), -1), -1)
    rho = jnp.max(jnp.sum(jnp.abs(An), -1), -1)
    bad = (enorm > guard) | ~jnp.isfinite(enorm)
    badm = bad[..., None, None]
    rho_ = rho[..., None, None]
    X = jnp.where(badm, eye / rho_, X0n)
    M = jnp.where(badm, An / rho_, M)
    two_eye = 2.0 * eye
    X = X @ (two_eye - M)
    for _ in range(max(iters - 1, 0)):
        X = X @ (two_eye - An @ X)
    return X * s[..., :, None] * s[..., None, :]


@highp
def spd_ns_inverse(S: jnp.ndarray, X0: jnp.ndarray | None = None, *,
                   iters: int = 10, warm_iters: int = 2) -> jnp.ndarray:
    """Approximate SPD inverse via bf16 Newton-Schulz (warm-startable).

    The TPU potrf/trsm custom calls serialize per batch element; for the
    Woodbury capacitance matrix (C ~ 400, few lanes) a bf16 NS inverse is
    pure MXU work. bf16 stalls at ~cond*1e-2 relative error — callers remove
    it with f32 refinement passes against the exact matrix. With ``X0``
    (a previous inverse of a nearby matrix) only ``warm_iters`` bf16
    iterations re-stall it.
    """
    C = S.shape[-1]
    d = jnp.diagonal(S, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    Sn = S * s[..., :, None] * s[..., None, :]
    rho = jnp.max(jnp.sum(jnp.abs(Sn), -1), -1)
    eye = jnp.eye(C, dtype=S.dtype)
    Snb = Sn.astype(jnp.bfloat16)
    if X0 is None:
        X = (eye / rho[..., None, None]).astype(jnp.bfloat16)
        n_iters = iters
    else:
        # guard residual in bf16: it only feeds a ~0.9 threshold test, and
        # the f32 (C, C) matmul would cost more than the warm start saves
        X0n = (X0 / jnp.maximum(s[..., :, None] * s[..., None, :],
                                1e-30)).astype(jnp.bfloat16)
        E = eye.astype(jnp.bfloat16) - Snb @ X0n
        enorm = jnp.max(jnp.sum(jnp.abs(E.astype(S.dtype)), -1), -1)
        bad = (enorm > 0.9) | ~jnp.isfinite(enorm)
        X = jnp.where(bad[..., None, None],
                      (eye / rho[..., None, None]).astype(jnp.bfloat16),
                      X0n)
        n_iters = warm_iters
    two_eye = (2.0 * eye).astype(jnp.bfloat16)
    for _ in range(n_iters):
        X = (X @ (two_eye - Snb @ X)).astype(jnp.bfloat16)
    return X.astype(S.dtype) * s[..., :, None] * s[..., None, :]


@highp
def spd_solve_approx(S: jnp.ndarray, b: jnp.ndarray, *, iters: int = 10,
                     refine: int = 2,
                     X0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Approximate SPD solve S z = b: bf16 Newton-Schulz + f32 refinement.

    bf16 NS stalls at ~cond*1e-2, so each f32 refinement pass (two (C,C)
    matvecs) contracts the error by that factor — 2 passes give ~1e-3
    relative, far below what the LM accept logic can see.
    """
    Xf = spd_ns_inverse(S, X0, iters=iters)
    z = jnp.einsum("...cd,...d->...c", Xf, b)
    for _ in range(refine):
        r = b - jnp.einsum("...cd,...d->...c", S, z)
        z = z + jnp.einsum("...cd,...d->...c", Xf, r)
    return z


class BTFactors(NamedTuple):
    """Reduction structure reused across refinement passes (rhs-independent)."""
    levels: Tuple     # per level: (Ainv, B_left, B_right, W_l, W_r)
    tail_Hinv: jnp.ndarray    # dense NS inverse of the <=threshold tail
    F_orig: int
    Fp: int


def bt_warm_state(fac: BTFactors) -> Tuple:
    """Extract the warm-start pytree (per-level inverses + tail inverse)."""
    return (tuple(lvl[0] for lvl in fac.levels), fac.tail_Hinv)


def _dense_tail_H(A, B):
    """Assemble the small dense tail system (Fl*m, Fl*m)."""
    Fl, m = A.shape[0], A.shape[1]
    dtype = A.dtype
    eye_f = jnp.eye(Fl, dtype=dtype)
    H = jnp.einsum("fij,fg->figj", A, eye_f)
    if Fl > 1:
        shift = jnp.eye(Fl, k=1, dtype=dtype)
        Bpad = jnp.concatenate([B, jnp.zeros((1, m, m), dtype)], 0)
        H = H + jnp.einsum("fij,fg->figj", Bpad, shift)
        H = H + jnp.einsum("fij,fg->gjfi", Bpad, shift)
    return H.reshape(Fl * m, Fl * m)


@highp
def bt_factor(A: jnp.ndarray, B: jnp.ndarray, *, direct_threshold: int = 8,
              ns_iters: int = 12, tail_ns_iters: int = 14,
              warm: Tuple | None = None,
              warm_iters: int = 2, fused: bool = False) -> BTFactors:
    """Forward cyclic reduction of the matrices only (no rhs).

    Per level stores the Newton-Schulz inverse of the odd blocks plus the
    reduction operators W_l = B_left Ainv and W_r = B_right^T Ainv so that
    bt_apply is nothing but matmuls. The <=direct_threshold tail is also
    inverted by NS — the full factor+apply pipeline contains zero
    factorization custom calls.

    ``warm`` (from bt_warm_state on a previous factor of a nearby matrix,
    e.g. the previous LM iteration's damped Hessian) seeds every NS chain:
    ``warm_iters`` squarings replace the full cold iteration count. Guarded
    per block — see ns_inverse_warm.
    """
    dummy_rhs = jnp.zeros(A.shape[:1] + (A.shape[1], 0), A.dtype)
    A, B, _, F_orig, Fp = _pad_pow2(A, B, dummy_rhs)

    # warm levels fuse into ONE Pallas kernel per level on TPU (the level
    # chain is launch-latency bound — see solver/pallas_level.py). Opt-in:
    # measured 1.8x at F=1024 packed (80-wide blocks, large grids) but
    # SLOWER for thin 20-wide blocks and under vmap, so only the packed
    # single-instance solver requests it; CPU and cold paths keep XLA.
    use_fused = fused and warm is not None and warm_iters == 2 \
        and jax.default_backend() == "tpu"

    levels = []
    li = 0
    while A.shape[0] > max(1, direct_threshold):
        Fl = A.shape[0]
        if use_fused:
            from omniswarm_tpu.solver.pallas_level import (
                fused_reduction_level)

            (Ainv, B_left, B_right, W_l, W_r,
             A_new, B_new) = fused_reduction_level(
                A.astype(jnp.float32), B.astype(jnp.float32), warm[0][li])
            li += 1
            levels.append((Ainv, B_left, B_right, W_l, W_r))
            A, B = A_new, B_new
            continue
        A_odd = A[1::2]
        B_left = B[0::2]
        B_right = jnp.zeros_like(B_left)
        if Fl > 2:
            B_right = B_right.at[:-1].set(B[1::2])
        if warm is not None:
            Ainv = ns_inverse_warm(A_odd, warm[0][li], warm_iters)
        else:
            Ainv = ns_inverse(A_odd, ns_iters)
        li += 1
        W_l = jnp.einsum("tij,tjk->tik", B_left, Ainv)       # B[2t] Ainv
        W_r = jnp.einsum("tji,tjk->tik", B_right, Ainv)      # B^T Ainv
        A_new = A[0::2] - jnp.einsum("tij,tkj->tik", W_l, B_left)
        A_new = A_new.at[1:].add(
            -jnp.einsum("tij,tjk->tik", W_r, B_right)[:-1])
        B_new = -jnp.einsum("tij,tjk->tik", W_l, B_right)[:-1]
        levels.append((Ainv, B_left, B_right, W_l, W_r))
        A, B = A_new, B_new

    H_tail = _dense_tail_H(A, B)
    if warm is not None:
        tail_Hinv = ns_inverse_warm(H_tail, warm[1], warm_iters)
    else:
        tail_Hinv = ns_inverse(H_tail, tail_ns_iters)

    return BTFactors(levels=tuple(levels), tail_Hinv=tail_Hinv,
                     F_orig=F_orig, Fp=Fp)


@highp
def bt_apply(fac: BTFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """One approximate solve M^-1 rhs using precomputed factors (matmuls).

    dtype-preserving: a bfloat16 rhs sweeps through the levels in bfloat16
    (half the HBM traffic of the K-RHS sweep — the measured bottleneck);
    the factor matrices stay f32 and the tail solve is done in f32.

    (Measured dead end, round 3: Pallas-fusing these sweep levels the way
    bt_factor's levels are fused made F=1024 SLOWER — 2.12 -> 2.53 ms/iter.
    The K-wide sweeps are bandwidth-shaped and the reshape-based even/odd
    split already avoids strided traffic, so per-pair kernel overhead on
    (1, m, K) blocks only adds cost. Factor levels fuse; apply levels
    stay XLA.)
    """
    F_orig = fac.F_orig
    dt = rhs.dtype
    if fac.Fp != F_orig:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((fac.Fp - F_orig,) + rhs.shape[1:], dt)], 0)

    # Forward: reduce rhs through the levels.
    odd_rhs = []
    for Ainv, B_left, B_right, W_l, W_r in fac.levels:
        half = rhs.reshape((rhs.shape[0] // 2, 2) + rhs.shape[1:])
        rhs_even, rhs_odd = half[:, 0], half[:, 1]
        r_new = rhs_even - jnp.einsum("tij,tjk->tik", W_l, rhs_odd).astype(dt)
        r_new = r_new.at[1:].add(
            -jnp.einsum("tij,tjk->tik", W_r, rhs_odd)[:-1].astype(dt))
        odd_rhs.append(rhs_odd)
        rhs = r_new

    n = fac.tail_Hinv.shape[-1]
    Fl_tail = n // rhs.shape[1]
    K = rhs.shape[-1]
    x = (fac.tail_Hinv @ rhs.astype(fac.tail_Hinv.dtype).reshape(n, K))
    x = x.reshape(Fl_tail, rhs.shape[1], K).astype(dt)

    # Back-substitution (exact given the level inverses).
    for (Ainv, B_left, B_right, _, _), rhs_odd in zip(
            reversed(fac.levels), reversed(odd_rhs)):
        x_even = x
        r = rhs_odd - jnp.einsum("tji,tjk->tik", B_left, x_even).astype(dt)
        x_shift = jnp.concatenate(
            [x_even[1:], jnp.zeros_like(x_even[:1])], 0)
        r = r - jnp.einsum("tij,tjk->tik", B_right, x_shift).astype(dt)
        x_odd = jnp.einsum("tij,tjk->tik", Ainv, r).astype(dt)
        Fl2 = x_even.shape[0]
        # interleave even/odd via stack+reshape (no strided scatters)
        x = jnp.stack([x_even, x_odd], axis=1).reshape(
            (2 * Fl2,) + x_even.shape[1:])

    return x[:F_orig]


@highp
def bt_matvec(A: jnp.ndarray, B: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact block-tridiagonal matvec T x (x: (F, m, K))."""
    y = jnp.einsum("fij,fjk->fik", A, x)
    if B.shape[0] > 0:
        y = y.at[:-1].add(jnp.einsum("fij,fjk->fik", B, x[1:]))
        y = y.at[1:].add(jnp.einsum("fji,fjk->fik", B, x[:-1]))
    return y


@highp
def bt_solve_ns(A: jnp.ndarray, B: jnp.ndarray, rhs: jnp.ndarray, *,
                direct_threshold: int = 8, ns_iters: int = 12,
                refine: int = 1) -> jnp.ndarray:
    """Matmul-only block-tridiagonal solve with iterative refinement.

    Same contract as bt_solve; trades the per-level Cholesky custom calls for
    Newton-Schulz inverses + `refine` residual-correction passes. With
    refine>=1 the step error is far below what the LM acceptance logic can
    see; use bt_solve (exact) for covariance extraction.
    """
    fac = bt_factor(A, B, direct_threshold=direct_threshold,
                    ns_iters=ns_iters)
    x = bt_apply(fac, rhs)
    for _ in range(refine):
        x = x + bt_apply(fac, rhs - bt_matvec(A, B, x))
    return x
