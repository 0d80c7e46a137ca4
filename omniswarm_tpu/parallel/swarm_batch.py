"""Fleet-scale solving: many decentralized estimator instances per chip/mesh.

The deployment shape of a decentralized swarm on TPU: every drone owns an
independent sliding-window problem (its own measurements, its own frame).
Served centrally (ground station / cloud replay / batch re-processing),
those D problems are *embarrassingly parallel* — so they run as one batched
block-tridiagonal LM with the problem (graph) batched alongside the state,
and the batch axis sharded across the device mesh with zero communication.

This is the swarm-level complement to parallel/sharded_solver.py (which
shards ONE problem's factors): here we shard ACROSS problems.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omniswarm_tpu.solver.dense import DenseGraph, assemble_blocks
from omniswarm_tpu.solver.gauss_newton import SolveResult, _apply_step


def stack_graphs(graphs: Sequence[DenseGraph]) -> DenseGraph:
    """Stack same-shape DenseGraphs along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *graphs)


def lm_solve_multigraph_impl(graphs: DenseGraph, poses0: jnp.ndarray, *,
                             max_iterations: int = 100,
                             huber_delta: float = 1.0,
                             det_sphere_std: float = 0.1,
                             det_inv_dep_std: float = 0.5,
                             function_tolerance: float = 1e-6) -> SolveResult:
    """Batched LM where each lane has its OWN graph (stacked DenseGraph).

    Identical trust-region logic to solver.dense.lm_solve_bt_batched, but
    the assembly/solve are vmapped over (graph, poses) jointly.
    """
    import jax.scipy.linalg as jsl

    from omniswarm_tpu.solver.block_tridiag import bt_solve

    B = poses0.shape[0]
    F, D = poses0.shape[1:3]
    m = 4 * D

    assemble = jax.vmap(functools.partial(
        assemble_blocks, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std),
        in_axes=(0, 0))

    def smw_solve_one(A, Boff, g, U, lam):
        diagT = jnp.diagonal(A, axis1=-2, axis2=-1)
        diagU = jnp.sum(U * U, axis=-1)
        d = lam * jnp.maximum(diagT + diagU, 1e-6)
        Ad = A + d[..., None] * jnp.eye(m, dtype=A.dtype)[None]
        rhs = jnp.concatenate([-g[..., None], U], axis=-1)
        Y = bt_solve(Ad, Boff, rhs)
        yb, YU = Y[..., 0], Y[..., 1:]
        C = U.shape[-1]
        S = jnp.eye(C, dtype=A.dtype) + jnp.einsum("fmc,fmd->cd", U, YU)
        Uyb = jnp.einsum("fmc,fm->c", U, yb)
        Lc, low = jsl.cho_factor(S, lower=True)
        z = jsl.cho_solve((Lc, low), Uyb)
        return (yb - jnp.einsum("fmc,c->fm", YU, z)).reshape(-1)

    smw_solve = jax.vmap(smw_solve_one)

    A0, B0, g0, U0, cost0 = assemble(graphs, poses0)

    def cond(state):
        return (~jnp.all(state[-1])) & (state[-2] < max_iterations)

    def body(state):
        poses, A, Boff, g, U, cost, lam, it, done = state
        dx = smw_solve(A, Boff, g, U, lam)
        bad = ~jnp.all(jnp.isfinite(dx), axis=-1)
        dx = jnp.where(bad[:, None], 0.0, dx)
        new_poses = jax.vmap(_apply_step)(poses, dx)
        An, Bn, gn, Un, new_cost = assemble(graphs, new_poses)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & ~bad & ~done

        def sel(new, old):
            return jnp.where(accept.reshape((B,) + (1,) * (new.ndim - 1)),
                             new, old)

        poses = sel(new_poses, poses)
        A, Boff, g, U = sel(An, A), sel(Bn, Boff), sel(gn, g), sel(Un, U)
        out_cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(done, lam, jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e10))
        converged = accept & (cost - new_cost <= function_tolerance * cost)
        stalled = (~accept) & (lam >= 1e9) & ~done
        return (poses, A, Boff, g, U, out_cost, lam, it + 1,
                done | converged | stalled)

    state0 = (poses0, A0, B0, g0, U0, cost0,
              jnp.full((B,), 1e-4, poses0.dtype), jnp.zeros((), jnp.int32),
              jnp.zeros((B,), bool))
    out = jax.lax.while_loop(cond, body, state0)
    return SolveResult(poses=out[0], cost=out[5], initial_cost=cost0,
                       iterations=out[7], lam=out[6])


lm_solve_multigraph = jax.jit(
    lm_solve_multigraph_impl,
    static_argnames=("max_iterations", "huber_delta", "det_sphere_std",
                     "det_inv_dep_std", "function_tolerance"),
)


def solve_fleet(graphs: Sequence[DenseGraph], inits: Sequence[jnp.ndarray],
                mesh: Optional[Mesh] = None, **kw) -> SolveResult:
    """Solve many per-drone problems; optionally shard the fleet over a mesh.

    With a mesh, the batch axis is placed across devices (NamedSharding) and
    XLA partitions the whole batched LM with zero collectives — linear
    scaling across chips/hosts.
    """
    stacked = stack_graphs(graphs)
    poses0 = jnp.stack(list(inits), 0)
    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())

        def place(x):
            if x.ndim >= 1 and x.shape[0] == poses0.shape[0] \
                    and x.shape[0] % mesh.devices.size == 0:
                return jax.device_put(x, NamedSharding(
                    mesh, P(axis, *([None] * (x.ndim - 1)))))
            return jax.device_put(x, repl)

        stacked = jax.tree_util.tree_map(place, stacked)
        poses0 = place(poses0)
    return lm_solve_multigraph(stacked, poses0, **kw)
