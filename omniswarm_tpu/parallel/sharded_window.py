"""Sliding-window LM with the FRAME axis sharded over a device mesh.

The reference caps its window at max_frame_number=100 keyframes because one
CPU must re-solve it every second (swarm_localization_solver.cpp:186-202,
loop-5-drone.launch). This module removes that ceiling the TPU way: the
(F, D, 4) pose grid, the (F, m, m) block-tridiagonal normal equations, and
the Woodbury loop columns are all sharded along frames across the mesh —
each device assembles and solves only its chunk; the couplings are

- a one-frame halo exchange (ppermute) for the ego-motion factors that
  straddle shard boundaries,
- the SPIKE boundary system for the block-tridiagonal solve
  (parallel/bt_spike.py — one small all_gather),
- a psum for the (C, C) Woodbury capacitance of loop closures and for the
  scalar cost.

Per LM iteration the bytes on ICI are O(m^2 + m*C) per shard — independent
of the window length — so windows of thousands of keyframes scale
~linearly in devices. The whole LM loop (assembly, solve, accept/reject)
compiles as ONE shard_map'd XLA program.

Algebraic contract: identical normal equations and LM trajectory as
solver/dense.py::lm_solve_bt with the exact linear path (up to float
summation order) — tested in tests/test_sharded_window.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from omniswarm_tpu.core.precision import highp
from omniswarm_tpu.parallel.bt_spike import spike_local_solve
from omniswarm_tpu.solver import factors as fx
from omniswarm_tpu.solver.dense import (
    DenseGraph,
    _relpose_terms_analytic,
    assemble_blocks,
)
from omniswarm_tpu.solver.gauss_newton import SolveResult, _apply_step
from omniswarm_tpu.solver.graph import empty_relpose

AXIS = "frames"


def _graph_specs(graph: DenseGraph, axis: str) -> DenseGraph:
    """PartitionSpecs: frame-indexed arrays sharded, loops replicated."""
    s, r = P(axis), P()
    return DenseGraph(
        range_dist=s, range_valid=s,
        range_sqrt_inf=s if graph.range_sqrt_inf.ndim else r,
        odom_dpose=s, odom_sqrt_info=s, odom_valid=s,
        det_dir=s, det_tb=s, det_invdep=s, det_valid=s, det_has_depth=s,
        loops=jax.tree.map(lambda _: r, graph.loops),
        pose_valid=s, pose_fixed=s, yaw_fixed=s,
        ant_pos=None if graph.ant_pos is None else r,
    )


def pad_graph_frames(graph: DenseGraph, poses0: jnp.ndarray,
                     n_devices: int):
    """Pad the frame axis to a multiple of the mesh size.

    Pad frames are pose_valid=False with no measurements; the odometry
    arrays are also padded from (F-1) to the new F so every frame-indexed
    array shards evenly (row f couples frames f, f+1; padded rows invalid).
    """
    F, D = graph.pose_valid.shape
    Fp = ((F + n_devices - 1) // n_devices) * n_devices

    def pad_f(x, rows):
        need = rows - x.shape[0]
        if need <= 0:
            return x
        pad = [(0, need)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    g = graph._replace(
        range_dist=pad_f(graph.range_dist, Fp),
        range_valid=pad_f(graph.range_valid, Fp),
        range_sqrt_inf=(pad_f(graph.range_sqrt_inf, Fp)
                        if graph.range_sqrt_inf.ndim else
                        graph.range_sqrt_inf),
        odom_dpose=pad_f(graph.odom_dpose, Fp),
        odom_sqrt_info=pad_f(graph.odom_sqrt_info, Fp),
        odom_valid=pad_f(graph.odom_valid, Fp),
        det_dir=pad_f(graph.det_dir, Fp),
        det_tb=pad_f(graph.det_tb, Fp),
        det_invdep=pad_f(graph.det_invdep, Fp),
        det_valid=pad_f(graph.det_valid, Fp),
        det_has_depth=pad_f(graph.det_has_depth, Fp),
        pose_valid=pad_f(graph.pose_valid, Fp),
        pose_fixed=pad_f(graph.pose_fixed, Fp),
        yaw_fixed=pad_f(graph.yaw_fixed, Fp),
    )
    poses = pad_f(poses0, Fp)
    return g, poses, F


def _halo_next(x, axis, nshards):
    """Each shard receives the first row of the NEXT shard (garbage wraps
    to the last shard — callers mask it)."""
    perm = [(i, (i - 1) % nshards) for i in range(nshards)]
    return jax.lax.ppermute(x[0], axis, perm)


def _send_next(x, axis, nshards, p):
    """Send x to the next shard; the receiver masks shard 0's wraparound."""
    perm = [(i, (i + 1) % nshards) for i in range(nshards)]
    r = jax.lax.ppermute(x, axis, perm)
    return jnp.where(p == 0, jnp.zeros_like(r), r)


@highp
def _assemble_sharded(g: DenseGraph, poses_loc, *, axis: str,
                      huber_delta: float, det_sphere_std: float,
                      det_inv_dep_std: float):
    """Shard-local normal equations with a one-frame halo.

    ``g`` holds this shard's frame rows (odometry row f couples local
    frames f, f+1 — the last row straddles into the next shard). Reuses the
    optimized dense assembly kernel on (Fs+1) frames: the halo frame
    collects the straddling odometry factor's diagonal/gradient
    contributions, which are then ppermuted to their owner.

    Returns (A (Fs,m,m), Bfull (Fs,m,m) with row Fs-1 = coupling to the
    next shard, gflat (Fs,m), U (Fs,m,4L), cost_part) — psum(cost_part)
    is the exact global cost.
    """
    nshards = jax.lax.psum(1, axis)
    p = jax.lax.axis_index(axis)
    Fs, D = g.pose_valid.shape
    m = 4 * D
    dtype = poses_loc.dtype

    # ONE packed halo ppermute instead of four (pose + 3 masks): the halo
    # exchange is latency-bound (a few KB), so collective COUNT is the
    # cost — pack [pose | valid | fixed | yaw_fixed] into (Fs, D, 7)
    # (VERDICT r4 item 6: reduce the per-iteration collective count)
    packed = jnp.concatenate(
        [poses_loc.astype(dtype),
         g.pose_valid[..., None].astype(dtype),
         g.pose_fixed[..., None].astype(dtype),
         g.yaw_fixed[..., None].astype(dtype)], -1)           # (Fs, D, 7)
    halo = _halo_next(packed, axis, nshards)                  # (D, 7)
    halo_pose = halo[..., :4]
    halo_pvalid = halo[..., 4] > 0.5
    halo_pfixed = halo[..., 5] > 0.5
    halo_yfixed = halo[..., 6] > 0.5
    last = p == nshards - 1
    halo_pvalid = jnp.where(last, jnp.zeros_like(halo_pvalid), halo_pvalid)

    def with_halo(x, fill=0):
        h = jnp.full_like(x[:1], fill)
        return jnp.concatenate([x, h], 0)

    si = g.range_sqrt_inf
    g_loc = DenseGraph(
        range_dist=with_halo(g.range_dist),
        range_valid=with_halo(g.range_valid, False),
        range_sqrt_inf=with_halo(si) if si.ndim else si,
        odom_dpose=g.odom_dpose,             # (Fs, D, 4) = local F_loc-1 rows
        odom_sqrt_info=g.odom_sqrt_info,
        odom_valid=g.odom_valid,
        det_dir=with_halo(g.det_dir),
        det_tb=with_halo(g.det_tb),
        det_invdep=with_halo(g.det_invdep),
        det_valid=with_halo(g.det_valid, False),
        det_has_depth=with_halo(g.det_has_depth, False),
        loops=empty_relpose(1, dtype),       # loops handled below
        pose_valid=jnp.concatenate([g.pose_valid, halo_pvalid[None]], 0),
        pose_fixed=jnp.concatenate([g.pose_fixed, halo_pfixed[None]], 0),
        yaw_fixed=jnp.concatenate([g.yaw_fixed, halo_yfixed[None]], 0),
        ant_pos=g.ant_pos,
    )
    poses_ext = jnp.concatenate([poses_loc, halo_pose[None]], 0)

    A_l, B_l, g_l, _U, cost = assemble_blocks(
        g_loc, poses_ext, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std)

    # halo row → owner (next shard's local row 0), and the boundary
    # coupling block the NEXT shard's SPIKE solve needs (its B_left = our
    # B_right) — all in ONE packed ppermute: [A_halo | g_halo | B_right]
    Bfull = B_l                                              # (Fs, m, m)
    send = jnp.concatenate(
        [A_l[Fs], g_l[Fs][:, None], Bfull[-1]], -1)          # (m, 2m+1)
    recv = _send_next(send, axis, nshards, p)
    A_in, g_in, B_left = recv[:, :m], recv[:, m], recv[:, m + 1:]
    A_p = A_l[:Fs].at[0].add(A_in)
    g_p = g_l[:Fs].at[0].add(g_in)

    # --- loop closures: replicated terms, shard-local U rows -------------
    l = g.loops
    L = l.valid.shape[0]
    poses_full = jax.lax.all_gather(poses_loc, axis).reshape(-1, D, 4)
    pflat = poses_full.reshape(-1, 4)
    pa = pflat[l.frame_a * D + l.drone_a]
    pb = pflat[l.frame_b * D + l.drone_b]
    r_l, Ja_l, Jb_l = _relpose_terms_analytic(pa, pb, l.dpose, l.sqrt_info)
    w_l = fx.huber_weight(r_l, huber_delta)
    loop_cost = 0.5 * jnp.sum(jnp.where(
        l.valid, fx.huber_rho(jnp.sum(r_l ** 2, -1), huber_delta), 0.0))
    cost = cost + jnp.where(p == 0, loop_cost, 0.0)
    ws = jnp.sqrt(w_l) * l.valid.astype(dtype)
    ja = Ja_l * ws[:, None, None]
    jb = Jb_l * ws[:, None, None]
    rl = r_l * ws[:, None]

    offset = p * Fs
    U = jnp.zeros((Fs * m, 4 * L), dtype)
    gl = jnp.zeros((Fs * m,), dtype)
    col = jnp.broadcast_to(
        (jnp.arange(L)[:, None, None] * 4
         + jnp.arange(4)[None, :, None]), (L, 4, 4))

    def scatter_endpoint(U, gl, frame, drone, J):
        own = (frame >= offset) & (frame < offset + Fs)
        row = ((frame - offset) * m + drone * 4)[:, None, None] \
            + jnp.arange(4)[None, None, :]                   # (L, 1, 4)
        row = jnp.broadcast_to(row, (L, 4, 4))
        row = jnp.where(own[:, None, None], row, Fs * m)     # dump slot
        Jm = jnp.where(own[:, None, None], J, 0.0)
        U2 = jnp.concatenate([U, jnp.zeros((1, 4 * L), dtype)], 0)
        U2 = U2.at[row.reshape(-1), col.reshape(-1)].add(Jm.reshape(-1))
        gv = jnp.einsum("kmi,km->ki", Jm, rl)
        growf = jnp.where(own[:, None], row[:, 0, :], Fs * m)
        gl2 = jnp.concatenate([gl, jnp.zeros((1,), dtype)], 0)
        gl2 = gl2.at[growf.reshape(-1)].add(gv.reshape(-1))
        return U2[:-1], gl2[:-1]

    U, gl = scatter_endpoint(U, gl, l.frame_a, l.drone_a, ja)
    U, gl = scatter_endpoint(U, gl, l.frame_b, l.drone_b, jb)
    U = U.reshape(Fs, m, 4 * L)
    gflat = g_p + gl.reshape(Fs, m)

    # free-parameter mask (assemble_blocks already masked its outputs; the
    # halo add and the loop rows need the local mask re-applied)
    free = g.pose_valid & ~g.pose_fixed
    mask4 = jnp.repeat(free[..., None], 4, -1)
    mask4 = mask4.at[..., 3].set(mask4[..., 3] & ~g.yaw_fixed)
    mflat = mask4.reshape(Fs, m).astype(dtype)
    A_p = A_p * mflat[:, :, None] * mflat[:, None, :] \
        + jnp.eye(m, dtype=dtype)[None] * jnp.clip(
            (1.0 - mflat), 0.0, 1.0)[:, :, None] * jnp.eye(m, dtype=dtype)
    U = U * mflat[:, :, None]
    gflat = gflat * mflat
    return A_p, Bfull, gflat, U, cost, B_left


@highp
def _smw_spike(A, Bfull, gflat, U, lam, *, axis: str,
               direct_threshold: int = 8, B_left=None):
    """Damped (T + U U^T) dx = -g with the frame axis sharded.

    Local rows of the block-tridiagonal sweep via SPIKE; the (C, C)
    capacitance is psum-reduced and solved replicated. ``B_left`` (the
    previous shard's boundary coupling) skips the SPIKE-internal
    ppermute when the assembly already exchanged it.
    """
    Fs, m = A.shape[0], A.shape[1]
    C = U.shape[-1]
    diagT = jnp.diagonal(A, axis1=-2, axis2=-1)
    diagU = jnp.einsum("fmc,fmc->fm", U, U)
    d = lam * jnp.maximum(diagT + diagU, 1e-6)
    Ad = A + d[..., None] * jnp.eye(m, dtype=A.dtype)[None]
    rhs = jnp.concatenate([-gflat[..., None], U], -1)        # (Fs, m, 1+C)
    Y = spike_local_solve(Ad, Bfull, rhs, axis=axis,
                          direct_threshold=direct_threshold,
                          B_left=B_left)
    yb, YU = Y[..., 0], Y[..., 1:]
    S_part = jnp.einsum("fmc,fmd->cd", U, YU)
    Uyb_part = jnp.einsum("fmc,fm->c", U, yb)
    S = jnp.eye(C, dtype=A.dtype) + jax.lax.psum(S_part, axis)
    Uyb = jax.lax.psum(Uyb_part, axis)
    z = jnp.linalg.solve(S, Uyb)                             # replicated
    dx = yb - jnp.einsum("fmc,c->fm", YU, z)
    return dx.reshape(-1)


def _lm_body_sharded(g: DenseGraph, poses0, *, axis: str,
                     max_iterations: int, huber_delta: float,
                     det_sphere_std: float, det_inv_dep_std: float,
                     function_tolerance: float, direct_threshold: int):
    assemble = functools.partial(
        _assemble_sharded, g, axis=axis, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std)
    smw = functools.partial(_smw_spike, axis=axis,
                            direct_threshold=direct_threshold)

    A0, B0, g0, U0, cost_p, Bl0 = assemble(poses0)
    cost0 = jax.lax.psum(cost_p, axis)
    lam0 = jnp.asarray(1e-4, poses0.dtype)

    def cond(state):
        return (~state[-1]) & (state[-2] < max_iterations)

    def body(state):
        poses, A, B, gf, U, Bl, cost, lam, it, _ = state
        dx = smw(A, B, gf, U, lam, B_left=Bl)
        bad = ~jnp.all(jnp.isfinite(dx))
        bad = jax.lax.pmax(bad.astype(jnp.int32), axis) > 0  # replicated
        new_poses = _apply_step(poses, jnp.where(bad, 0.0, dx))
        An, Bn, gn, Un, cost_part, Bln = assemble(new_poses)
        new_cost = jax.lax.psum(cost_part, axis)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & ~bad
        poses = jnp.where(accept, new_poses, poses)
        A = jnp.where(accept, An, A)
        B = jnp.where(accept, Bn, B)
        gf = jnp.where(accept, gn, gf)
        U = jnp.where(accept, Un, U)
        Bl = jnp.where(accept, Bln, Bl)
        out_cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e10)
        converged = accept & (cost - new_cost <= function_tolerance * cost)
        stalled = (~accept) & (lam >= 1e9)
        return (poses, A, B, gf, U, Bl, out_cost, lam, it + 1,
                converged | stalled)

    state0 = (poses0, A0, B0, g0, U0, Bl0, cost0, lam0,
              jnp.zeros((), jnp.int32), jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, state0)
    return out[0], out[6], cost0, out[8], out[7]


def lm_solve_bt_sharded(graph: DenseGraph, poses0: jnp.ndarray, mesh: Mesh,
                        *, max_iterations: int = 100,
                        huber_delta: float = 1.0,
                        det_sphere_std: float = 0.1,
                        det_inv_dep_std: float = 0.5,
                        function_tolerance: float = 1e-6,
                        direct_threshold: int = 8) -> SolveResult:
    """Frame-sharded sliding-window LM solve over ``mesh``.

    Same contract as solver.dense.lm_solve_bt; the frame axis is padded to
    a multiple of the mesh size internally. Returns replicated outputs.
    """
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    graph, poses0, F_orig = pad_graph_frames(graph, poses0, nd)

    body = functools.partial(
        _lm_body_sharded, axis=axis, max_iterations=max_iterations,
        huber_delta=huber_delta, det_sphere_std=det_sphere_std,
        det_inv_dep_std=det_inv_dep_std,
        function_tolerance=function_tolerance,
        direct_threshold=direct_threshold)

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(_graph_specs(graph, axis), P(axis)),
            out_specs=(P(axis), P(), P(), P(), P()),
            check_vma=False,
        )
    )
    poses, cost, cost0, it, lam = fn(graph, poses0)
    return SolveResult(poses=poses[:F_orig], cost=cost, initial_cost=cost0,
                       iterations=it, lam=lam)
