"""Locate the fleet-lane vs lock-step gap (VERDICT r2 item 2).

Times, at B=8 / F=100 / D=5 with ONE shared loop capacity:
- vmapped assemble with a SHARED graph (batch-8 lock-step mode)
- vmapped assemble with a STACKED per-lane graph (fleet mode)
- the warm SMW solve (identical shapes in both modes)
- full iterations in both modes
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.3f} ms/call", flush=True)
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omniswarm_tpu import sim
    from omniswarm_tpu.parallel.swarm_batch import stack_graphs
    from omniswarm_tpu.solver.dense import (_smw_solve_core, assemble_blocks,
                                            dense_graph_from_sim)

    B = 8
    sims = [sim.generate(sim.SimParams(num_drones=5, num_frames=100,
                                       seed=100 + k)) for k in range(B)]
    cap = max(8, ((max(len(d.loops) for d in sims) + 15) // 16) * 16)
    print(f"lane loops: {[len(d.loops) for d in sims]} cap={cap}",
          flush=True)
    graphs = [dense_graph_from_sim(d, max_loops=cap) for d in sims]
    stacked = jax.device_put(stack_graphs(
        [jax.tree_util.tree_map(jnp.asarray, g) for g in graphs]))
    shared = jax.device_put(jax.tree_util.tree_map(jnp.asarray, graphs[0]))
    poses = jax.device_put(jnp.stack(
        [jnp.asarray(d.vio, jnp.float32) for d in sims]))

    base = assemble_blocks
    v_shared = jax.vmap(functools.partial(base, shared))
    v_stacked = jax.vmap(base)

    res = {"cap": cap}

    @jax.jit
    def loop_shared(p):
        def body(i, carry):
            p_, acc = carry
            _, _, g, _, c = v_shared(p_)
            return p_ + 1e-12 * g.reshape(p_.shape), acc + c
        return jax.lax.fori_loop(0, REPS, body, (p, jnp.zeros(B)))
    res["assemble_shared_ms"] = timeit("assemble shared-graph (B=8)",
                                       loop_shared, poses)

    @jax.jit
    def loop_stacked(p):
        def body(i, carry):
            p_, acc = carry
            _, _, g, _, c = v_stacked(stacked, p_)
            return p_ + 1e-12 * g.reshape(p_.shape), acc + c
        return jax.lax.fori_loop(0, REPS, body, (p, jnp.zeros(B)))
    res["assemble_stacked_ms"] = timeit("assemble stacked-graph (B=8)",
                                        loop_stacked, poses)

    A0, B0, g0, U0, _ = v_stacked(stacked, poses)
    Ub = U0.astype(jnp.bfloat16)
    lam = jnp.full((B,), 1e-4, jnp.float32)
    smw_cold = jax.vmap(lambda a, b, g, u, l: _smw_solve_core(
        a, b, g, u, l, None))
    smw_warm = jax.vmap(lambda a, b, g, u, l, w: _smw_solve_core(
        a, b, g, u, l, w))

    @jax.jit
    def loop_smw(g):
        _, w0 = smw_cold(A0, B0, g, Ub, lam)
        def body(i, carry):
            g_, w, acc = carry
            dx, w = smw_warm(A0, B0, g_, Ub, lam, w)
            return g_ + 1e-12 * dx.reshape(g_.shape), w, acc + dx[:, 0]
        return jax.lax.fori_loop(0, REPS, body, (g, w0, jnp.zeros(B)))[2]
    res["smw_ms"] = timeit(f"smw warm (B=8, C={U0.shape[-1]})",
                           loop_smw, g0)

    @jax.jit
    def loop_iter_stacked(p):
        A_, B_, g_, U_, _ = v_stacked(stacked, p)
        _, w0 = smw_cold(A_, B_, g_, U_.astype(jnp.bfloat16), lam)
        def body(i, carry):
            p_, w, acc = carry
            A, Bo, g, U, c = v_stacked(stacked, p_)
            dx, w = smw_warm(A, Bo, g, U.astype(jnp.bfloat16), lam, w)
            return p_ + 1e-12 * dx.reshape(p_.shape), w, acc + c
        return jax.lax.fori_loop(0, REPS, body, (p, w0, jnp.zeros(B)))[2]
    res["iter_stacked_ms"] = timeit("full iter stacked (B=8)",
                                    loop_iter_stacked, poses)

    @jax.jit
    def loop_iter_shared(p):
        A_, B_, g_, U_, _ = v_shared(p)
        _, w0 = smw_cold(A_, B_, g_, U_.astype(jnp.bfloat16), lam)
        def body(i, carry):
            p_, w, acc = carry
            A, Bo, g, U, c = v_shared(p_)
            dx, w = smw_warm(A, Bo, g, U.astype(jnp.bfloat16), lam, w)
            return p_ + 1e-12 * dx.reshape(p_.shape), w, acc + c
        return jax.lax.fori_loop(0, REPS, body, (p, w0, jnp.zeros(B)))[2]
    res["iter_shared_ms"] = timeit("full iter shared (B=8)",
                                   loop_iter_shared, poses)

    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
