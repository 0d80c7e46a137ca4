"""Profile the batched BT-LM iteration: assembly vs SMW linear solve.

Times each stage as its own jit with a data-dependent chain (fori_loop) so
XLA can't hoist the work, mirroring bench.py's methodology.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:32s} {dt*1e3:8.3f} ms/call")
    return dt


def main():
    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.dense import (
        _smw_solve_core, assemble_blocks, dense_graph_from_sim)

    params = sim.SimParams(num_drones=5, num_frames=100, seed=0)
    data = sim.generate(params)
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    rng = np.random.default_rng(0)
    B = 8
    inits = np.tile(np.asarray(init)[None], (B, 1, 1, 1))
    for b in range(1, B):
        inits[b, :, 1:, :3] += rng.normal(0, 0.4, size=(100, 4, 3)).astype(
            np.float32)
    inits = jax.device_put(jnp.asarray(inits))

    assemble = jax.vmap(functools.partial(assemble_blocks, graph))
    smw = jax.vmap(lambda a, b, g_, u, l: _smw_solve_core(
        a, b, g_, u, l, None, exact=False)[0])
    smw_cold_full = jax.vmap(lambda a, b, g_, u, l: _smw_solve_core(
        a, b, g_, u, l, None, exact=False))
    smw_warm = jax.vmap(lambda a, b, g_, u, l, w: _smw_solve_core(
        a, b, g_, u, l, w, exact=False))

    A0, B0, g0, U0, c0 = assemble(inits)
    print("shapes: A", A0.shape, "B", B0.shape, "g", g0.shape, "U", U0.shape)
    lam = jnp.full((B,), 1e-4, jnp.float32)

    @jax.jit
    def loop_assemble(poses):
        def body(i, carry):
            p, acc = carry
            _, _, g, _, c = assemble(p)
            # data-dependent perturbation so nothing hoists
            return p + 1e-12 * g.reshape(p.shape), acc + c
        return jax.lax.fori_loop(0, REPS, body, (poses, jnp.zeros((B,))))

    @jax.jit
    def loop_smw(A, Boff, g, U, lam):
        def body(i, carry):
            g_, acc = carry
            dx = smw(A, Boff, g_, U, lam)
            return g_ + 1e-12 * dx.reshape(g_.shape), acc + dx[:, 0]
        return jax.lax.fori_loop(0, REPS, body, (g, jnp.zeros((B,))))

    @jax.jit
    def loop_both(poses, lam):
        def body(i, carry):
            p, acc = carry
            A, Boff, g, U, c = assemble(p)
            dx = smw(A, Boff, g, U, lam)
            return p + 1e-12 * dx.reshape(p.shape), acc + c
        return jax.lax.fori_loop(0, REPS, body, (poses, jnp.zeros((B,))))

    @jax.jit
    def loop_smw_warm(A, Boff, g, U, lam):
        _, w0 = smw_cold_full(A, Boff, g, U, lam)
        def body(i, carry):
            g_, w, acc = carry
            dx, w = smw_warm(A, Boff, g_, U, lam, w)
            return g_ + 1e-12 * dx.reshape(g_.shape), w, acc + dx[:, 0]
        return jax.lax.fori_loop(0, REPS, body, (g, w0, jnp.zeros((B,))))[2]

    @jax.jit
    def loop_both_warm(poses, lam):
        A_, B_, g_, U_, _ = assemble(poses)
        _, w0 = smw_cold_full(A_, B_, g_, U_, lam)
        def body(i, carry):
            p, w, acc = carry
            A, Boff, g, U, c = assemble(p)
            dx, w = smw_warm(A, Boff, g, U, lam, w)
            return p + 1e-12 * dx.reshape(p.shape), w, acc + c
        return jax.lax.fori_loop(0, REPS, body, (poses, w0, jnp.zeros((B,))))[2]

    timeit("assemble_blocks (B=8)", loop_assemble, inits)
    timeit("smw_solve cold (B=8)", loop_smw, A0, B0, g0, U0, lam)
    timeit("smw_solve warm (B=8)", loop_smw_warm, A0, B0, g0, U0, lam)
    timeit("assemble+smw cold (B=8)", loop_both, inits, lam)
    timeit("assemble+smw warm (B=8)", loop_both_warm, inits, lam)




def profile_smw_internals():
    import functools

    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.block_tridiag import (
        bt_apply, bt_factor, bt_matvec, spd_solve_approx)
    from omniswarm_tpu.solver.dense import assemble_blocks, dense_graph_from_sim

    params = sim.SimParams(num_drones=5, num_frames=100, seed=0)
    data = sim.generate(params)
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    B = 8
    inits = jnp.tile(init[None], (B, 1, 1, 1))
    assemble = jax.vmap(functools.partial(assemble_blocks, graph))
    A0, B0, g0, U0, c0 = assemble(inits)
    lam = jnp.full((B,), 1e-4, jnp.float32)
    m = A0.shape[-1]
    eye = jnp.eye(m, dtype=A0.dtype)
    diagT = jnp.diagonal(A0, axis1=-2, axis2=-1)
    diagU = jnp.sum(U0 * U0, axis=-1)
    d = 1e-4 * jnp.maximum(diagT + diagU, 1e-6)
    Ad0 = A0 + d[..., None] * eye[None, None]

    import functools as _ft

    def _factor_apply(Ad, Boff, rhs):
        fac = bt_factor(Ad, Boff, ns_iters=8, direct_threshold=4)
        return bt_apply(fac, rhs)

    vfactor = jax.vmap(lambda Ad, Boff: bt_factor(
        Ad, Boff, ns_iters=8, direct_threshold=4).tail_Hinv)
    vfactor_apply = jax.vmap(_factor_apply)

    @jax.jit
    def loop_factor(Ad, Boff):
        def body(i, carry):
            Ad_, acc = carry
            tA = vfactor(Ad_, Boff)
            return Ad_ + 1e-12 * tA.sum(), acc + tA[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, (Ad, jnp.zeros(())))


    @jax.jit
    def loop_apply_g(g):
        def body(i, carry):
            g_, acc = carry
            y = vfactor_apply(Ad0, B0, -g_[..., None])[..., 0]
            return g_ + 1e-12 * y, acc + y[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, (g, jnp.zeros(())))

    Ub = U0.astype(jnp.bfloat16)

    @jax.jit
    def loop_apply_U(U):
        def body(i, carry):
            U_, acc = carry
            Y = vfactor_apply(Ad0, B0, U_)
            return U_ + (1e-12 * acc).astype(U_.dtype) * U_, acc + Y[0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, (U, jnp.zeros(())))

    YU0 = vfactor_apply(Ad0, B0, Ub)

    @jax.jit
    def loop_S(U, YU, g):
        def body(i, carry):
            g_, acc = carry
            yb = vfactor_apply(Ad0, B0, -g_[..., None])[..., 0]
            S = jnp.eye(U.shape[-1], dtype=jnp.float32) + jnp.einsum(
                "bfmc,bfmd->bcd", U.astype(YU.dtype), YU,
                preferred_element_type=jnp.float32)
            Uyb = jnp.einsum("bfmc,bfm->bc", U, yb)
            z = jax.vmap(spd_solve_approx)(S, Uyb)
            dx = yb - jnp.einsum("bfmc,bc->bfm", YU, z.astype(YU.dtype),
                                 preferred_element_type=jnp.float32)
            return g_ + 1e-12 * dx, acc + z[0, 0]
        return jax.lax.fori_loop(0, REPS, body, (g, jnp.zeros(())))

    timeit("bt_factor (B=8)", loop_factor, Ad0, B0)
    timeit("factor+apply g 1col (B=8)", loop_apply_g, g0)
    timeit("factor+apply U 388col bf16", loop_apply_U, Ub)
    timeit("factor+applyg+S+cap+corr", loop_S, U0, YU0, g0)


if __name__ == "__main__":
    import sys as _sys

    if "--internals-only" in _sys.argv:
        profile_smw_internals()
    else:
        main()
        profile_smw_internals()
