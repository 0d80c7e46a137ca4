"""Fused cyclic-reduction level as ONE Pallas kernel.

Measured on v5e (tools/profile_fscale.py, round 3): each reduction level of
the block-tridiagonal factorization is a chain of ~15 thin XLA ops on
(t, m, m) blocks whose cost is dominated by per-op launch latency — the
`ns_inverse_warm` sub-chain alone costs ~0.8 ms nearly independent of t.
This kernel fuses the whole level — warm-started Newton-Schulz inverse of
the odd blocks (guarded, 2 squarings) plus the reduction operators
W_l = B_left A^-1, W_r = B_right^T A^-1, A_new, corr_left, B_new — into a
single pallas_call whose grid walks the block pairs, so the level is one
kernel launch with pipelined (1, m, m) VMEM blocks instead of ~15 launches.

The strided even/odd addressing is folded into BlockSpec index_maps (the
XLA path pays separate strided-slice copies for it). The only level work
left outside is the one-row-shifted neighbor add of corr_left (a cheap
scatter XLA handles fine).

Numerics match block_tridiag.ns_inverse_warm exactly in structure: Jacobi
scaling, row-sum guard with I/rho fallback, warm_iters=2, symmetric
rescale. Tested against the XLA level in tests/test_pallas_level.py.

Used by block_tridiag.bt_factor on TPU (interpret mode on CPU tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _level_kernel(guard: float,
                  a_even_ref, a_odd_ref, b_left_ref, b_right_ref, x0_ref,
                  ainv_ref, wl_ref, wr_ref, anew_ref, corrl_ref, bnew_ref,
                  blout_ref, brout_ref):
    m = a_odd_ref.shape[-1]
    f32 = jnp.float32
    A_odd = a_odd_ref[0].astype(f32)
    A_even = a_even_ref[0].astype(f32)
    B_left = b_left_ref[0].astype(f32)
    B_right = b_right_ref[0].astype(f32)
    X0 = x0_ref[0].astype(f32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = (rows == cols).astype(f32)

    # Jacobi scaling (ns_inverse_warm): An = S A S with unit diagonal
    d = jnp.sum(A_odd * eye, axis=1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    ss = s[:, None] * s[None, :]
    An = A_odd * ss
    X0n = X0 / jnp.maximum(ss, 1e-30)
    # guard residual doubles as the first NS iteration's inner product
    M = jnp.dot(An, X0n, preferred_element_type=f32)
    enorm = jnp.max(jnp.sum(jnp.abs(eye - M), axis=1))
    rho = jnp.max(jnp.sum(jnp.abs(An), axis=1))
    bad = (enorm > guard) | ~jnp.isfinite(enorm)
    X = jnp.where(bad, eye / rho, X0n)
    M = jnp.where(bad, An / rho, M)
    two_eye = 2.0 * eye
    X = jnp.dot(X, two_eye - M, preferred_element_type=f32)
    # second (and final) warm squaring
    X = jnp.dot(X, two_eye - jnp.dot(An, X, preferred_element_type=f32),
                preferred_element_type=f32)
    Ainv = X * ss

    W_l = jnp.dot(B_left, Ainv, preferred_element_type=f32)
    W_r = jnp.dot(B_right.T, Ainv, preferred_element_type=f32)
    ainv_ref[0] = Ainv
    wl_ref[0] = W_l
    wr_ref[0] = W_r
    anew_ref[0] = A_even - jnp.dot(W_l, B_left.T, preferred_element_type=f32)
    corrl_ref[0] = jnp.dot(W_r, B_right, preferred_element_type=f32)
    bnew_ref[0] = -jnp.dot(W_l, B_right, preferred_element_type=f32)
    # contiguous passthrough copies (bt_apply consumes these; producing
    # them here avoids two strided-slice ops per level in XLA)
    blout_ref[0] = B_left
    brout_ref[0] = B_right


@functools.partial(jax.jit, static_argnames=("guard",))
def fused_reduction_level(A: jnp.ndarray, B: jnp.ndarray, X0: jnp.ndarray,
                          *, guard: float = 0.95
                          ) -> Tuple[jnp.ndarray, ...]:
    """One cyclic-reduction level over interleaved blocks.

    A: (Fl, m, m) current-level diagonal blocks (Fl even);
    B: (Fl-1, m, m) off-diagonals (B[f] couples f, f+1);
    X0: (Fl/2, m, m) warm starts for the odd-block inverses.

    Returns (Ainv, B_left, B_right, W_l, W_r, A_new, B_new) matching the
    bt_factor level contract: A_new includes the shifted corr_left add and
    B_new the trailing-row drop.
    """
    Fl, m = A.shape[0], A.shape[1]
    t = Fl // 2
    # pad B to Fl rows so B[2i+1] (B_right) is addressable for the last
    # pair (zero = no coupling)
    Bp = jnp.concatenate([B, jnp.zeros((Fl - B.shape[0], m, m), B.dtype)], 0)

    blk = pl.BlockSpec((1, m, m), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_level_kernel, guard),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, m, m), lambda i: (2 * i, 0, 0)),      # A_even
            pl.BlockSpec((1, m, m), lambda i: (2 * i + 1, 0, 0)),  # A_odd
            pl.BlockSpec((1, m, m), lambda i: (2 * i, 0, 0)),      # B_left
            pl.BlockSpec((1, m, m), lambda i: (2 * i + 1, 0, 0)),  # B_right
            blk,                                                   # X0
        ],
        out_specs=[blk] * 8,
        out_shape=[jax.ShapeDtypeStruct((t, m, m), jnp.float32)] * 8,
        interpret=_interpret(),
    )(A, A, Bp, Bp, X0)
    Ainv, W_l, W_r, A_new, corr_l, B_new, B_left, B_right = outs
    A_new = A_new.at[1:].add(-corr_l[:-1])
    return Ainv, B_left, B_right, W_l, W_r, A_new, B_new[:-1]
