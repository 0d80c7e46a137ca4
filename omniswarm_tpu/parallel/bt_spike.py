"""Frame-sharded block-tridiagonal solve over a device mesh (SPIKE).

Scales the sliding-window axis across chips: the reference bounds its window
at 100 keyframes because Ceres solves it on one CPU
(/root/reference/swarm_localization/src/swarm_localization_solver.cpp:186-202,
max_frame_number); here a window of thousands of keyframes (city-scale
mapping, large swarms) is sharded over the mesh along frames and solved with
one neighbor exchange plus one small all-gather per solve.

Algorithm (SPIKE / block domain decomposition for SPD block-tridiagonal T):

    shard p owns frames [o, o+Fs). Its principal submatrix T_p is SPD, so
    x_p = Y_p - W_p b_{p-1} - V_p t_{p+1}, where
        Y_p = T_p^-1 rhs_p                      (local, Fs x m x K)
        W_p = T_p^-1 (e_first  B_left^T)        (left spike, Fs x m x m)
        V_p = T_p^-1 (e_last   B_right)         (right spike, Fs x m x m)
    and t_p = x_p[0], b_p = x_p[-1] are the shard boundary unknowns. Taking
    the first/last block rows gives a reduced system in the 2P boundary
    blocks, assembled from all-gathered spike tips and solved replicated
    (size 2*P*m — trivial), after which each shard corrects its interior
    locally.

Communication per solve: one ppermute (the m x m coupling block B from the
previous shard) + one all_gather of 4 spike-tip m x m blocks and 2 boundary
m x K rhs rows per shard. Everything else — the local cyclic-reduction
solves with all K right-hand sides — is perfectly parallel over ICI-less
local compute, so the linear solve scales ~linearly in devices for large F.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from omniswarm_tpu.core.precision import highp
from omniswarm_tpu.solver.block_tridiag import bt_solve

AXIS = "frames"


def pad_B_to_F(B: jnp.ndarray, F: int) -> jnp.ndarray:
    """Pad the (F-1, m, m) off-diagonal stack to (F, m, m) with a zero last
    row so the frame axis shards evenly; B[f] couples frames f and f+1."""
    if B.shape[0] == F:
        return B
    return jnp.concatenate(
        [B, jnp.zeros((F - B.shape[0],) + B.shape[1:], B.dtype)], 0)


@highp
def spike_local_solve(A, Bfull, rhs, *, axis: str, direct_threshold: int = 8,
                      B_left=None):
    """shard_map body: local solve + reduced boundary system + correction.

    Callable from inside any shard_map over ``axis`` (the sharded LM in
    parallel/sharded_window.py calls it per iteration).

    A: (Fs, m, m) local diagonal blocks; Bfull: (Fs, m, m) local off-diagonal
    rows (row i couples local frames i, i+1; the last row couples to the
    NEXT shard and must be zero on the final shard); rhs: (Fs, m, K).
    ``B_left`` (the previous shard's B_right, zero on shard 0) skips the
    neighbor hop when the caller already exchanged it — the sharded LM
    packs it into the assembly's boundary ppermute.
    """
    Fs, m, K = rhs.shape
    nshards = jax.lax.psum(1, axis)
    p = jax.lax.axis_index(axis)

    B_right = Bfull[-1]                                   # couples to p+1
    if B_left is None:
        # left coupling block = previous shard's B_right (one neighbor hop)
        perm = [(i, (i + 1) % nshards) for i in range(nshards)]
        B_left = jax.lax.ppermute(B_right, axis, perm)
        B_left = jnp.where(p == 0, jnp.zeros_like(B_left), B_left)
    B_int = Bfull[:-1]                                    # internal couplings

    # Local solves, all right-hand sides at once: [rhs | W-cols | V-cols].
    ext = jnp.zeros((Fs, m, 2 * m), A.dtype)
    ext = ext.at[0, :, :m].set(B_left.T)                  # e_first B_left^T
    ext = ext.at[-1, :, m:].set(B_right)                  # e_last  B_right
    sol = bt_solve(A, B_int, jnp.concatenate([rhs, ext], -1),
                   direct_threshold=direct_threshold)
    Y, W, V = sol[..., :K], sol[..., K:K + m], sol[..., K + m:]

    # Reduced system in boundary unknowns u = [t_0, b_0, t_1, b_1, ...]:
    #   t_p + W_p[0]  b_{p-1} + V_p[0]  t_{p+1} = Y_p[0]
    #   b_p + W_p[-1] b_{p-1} + V_p[-1] t_{p+1} = Y_p[-1]
    tips = jnp.stack([W[0], W[-1], V[0], V[-1]], 0)       # (4, m, m)
    ytips = jnp.stack([Y[0], Y[-1]], 0)                   # (2, m, K)
    # ONE fused all-gather for both boundary payloads (VERDICT r4 item 6:
    # fewer collectives per iteration; the gather is latency-dominated)
    packed = jnp.concatenate(
        [tips.reshape(-1), ytips.reshape(-1)], 0)         # (4mm + 2mK,)
    packed_g = jax.lax.all_gather(packed, axis)           # (P, 4mm+2mK)
    tips_g = packed_g[:, :4 * m * m].reshape(-1, 4, m, m)
    ytips_g = packed_g[:, 4 * m * m:].reshape(-1, 2, m, K)

    n = 2 * nshards * m
    R = jnp.eye(n, dtype=A.dtype)
    rrhs = ytips_g.reshape(n, K)
    for q in range(nshards):
        rt, rb = (2 * q) * m, (2 * q + 1) * m
        if q > 0:
            cb_prev = (2 * (q - 1) + 1) * m
            R = R.at[rt:rt + m, cb_prev:cb_prev + m].set(tips_g[q, 0])
            R = R.at[rb:rb + m, cb_prev:cb_prev + m].set(tips_g[q, 1])
        if q < nshards - 1:
            ct_next = (2 * (q + 1)) * m
            R = R.at[rt:rt + m, ct_next:ct_next + m].set(tips_g[q, 2])
            R = R.at[rb:rb + m, ct_next:ct_next + m].set(tips_g[q, 3])
    u = jnp.linalg.solve(R, rrhs)                         # (n, K) replicated
    u = u.reshape(nshards, 2, m, K)

    # local correction: x_p = Y_p - W_p b_{p-1} - V_p t_{p+1}
    b_prev = jnp.where(p == 0, jnp.zeros((m, K), A.dtype),
                       u[jnp.maximum(p - 1, 0), 1])
    t_next = jnp.where(p == nshards - 1, jnp.zeros((m, K), A.dtype),
                       u[jnp.minimum(p + 1, nshards - 1), 0])
    x = (Y - jnp.einsum("fij,jk->fik", W, b_prev)
         - jnp.einsum("fij,jk->fik", V, t_next))
    return x


def spike_solve(A: jnp.ndarray, B: jnp.ndarray, rhs: jnp.ndarray,
                mesh: Mesh, *, direct_threshold: int = 8) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system with frames sharded over
    ``mesh``; same contract as solver.block_tridiag.bt_solve.

    F must be divisible by the mesh size (pad with identity diagonal blocks
    and zero off-diagonals/rhs if needed — see ``pad_for_mesh``).
    """
    F = A.shape[0]
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    if F % nd:
        raise ValueError(f"F={F} not divisible by mesh size {nd}; "
                         "use pad_for_mesh first")
    Bfull = pad_B_to_F(B, F)
    fn = jax.jit(
        jax.shard_map(
            functools.partial(spike_local_solve, axis=axis,
                              direct_threshold=direct_threshold),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    return fn(A, Bfull, rhs)


def pad_for_mesh(A: jnp.ndarray, B: jnp.ndarray, rhs: jnp.ndarray,
                 n_devices: int):
    """Pad frames so F divides the mesh size: identity diagonal blocks,
    zero couplings and rhs. Returns (A, B(F,m,m), rhs, F_orig)."""
    F, m = A.shape[0], A.shape[1]
    Fp = ((F + n_devices - 1) // n_devices) * n_devices
    Bfull = pad_B_to_F(B, F)
    if Fp != F:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), (Fp - F, m, m))
        A = jnp.concatenate([A, eye], 0)
        Bfull = jnp.concatenate(
            [Bfull, jnp.zeros((Fp - F, m, m), B.dtype)], 0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Fp - F,) + rhs.shape[1:], rhs.dtype)], 0)
    return A, Bfull, rhs, F
