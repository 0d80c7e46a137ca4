"""Stage-level F-scaling profile of the single-instance BT-LM solver.

VERDICT r2 item 1: F=1024 runs 13.6 ms/iter vs 0.48 ms at F=100 (28x time
for 10.2x frames). This tool times each stage of one LM iteration at
F in {128, 256, 512, 1024} to locate the superlinear stage. Methodology
follows tools/profile_solver.py: each stage is its own jit with a
data-dependent fori_loop chain so XLA can't hoist invariant work.

Usage: python tools/profile_fscale.py [--frames 128,256,512,1024]
       [--stages assemble,smw,factor,apply,iter] [--reps 30]
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


def timeit(name, fn, *args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.3f} ms/call", flush=True)
    return dt * 1e3


def profile_F(F, stages, reps, pack=1):
    from omniswarm_tpu import sim
    from omniswarm_tpu.solver.block_tridiag import (
        bt_apply, bt_factor, bt_warm_state, spd_ns_inverse)
    from omniswarm_tpu.solver.dense import (
        _smw_solve_core, assemble_blocks, dense_graph_from_sim)

    # loop_every scaled so loop density per frame matches the headline
    # problem (F=100, loop_every=5 -> 1024 uses the bench's 128? No: the
    # bench uses loop_every=128 at F=1024. Profile BOTH densities.)
    loop_every = 5 if F <= 128 else (128 if F >= 1024 else 5 * F // 100)
    data = sim.generate(sim.SimParams(num_drones=5, num_frames=F, seed=1,
                                      loop_every=loop_every))
    graph = jax.device_put(dense_graph_from_sim(data))
    init = jnp.asarray(data.vio, jnp.float32)
    assemble = functools.partial(assemble_blocks, graph)
    A0, B0, g0, U0, c0 = jax.jit(assemble)(init)
    jax.block_until_ready(A0)
    C = U0.shape[-1]
    m = A0.shape[-1]
    print(f"F={F} loops={len(data.loops)} C={C} m={m}", flush=True)
    lam = jnp.asarray(1e-4, jnp.float32)
    Ub = U0.astype(jnp.bfloat16)
    res = {"F": F, "C": int(C), "loops": len(data.loops)}

    eye = jnp.eye(m, dtype=A0.dtype)
    diagT = jnp.diagonal(A0, axis1=-2, axis2=-1)
    diagU = jnp.sum(U0 * U0, axis=-1)
    Ad0 = A0 + (1e-4 * jnp.maximum(diagT + diagU, 1e-6))[..., None] * eye

    if "assemble" in stages:
        @jax.jit
        def loop_assemble(poses):
            def body(i, carry):
                p, acc = carry
                _, _, g, _, c = assemble(p)
                return p + 1e-12 * g.reshape(p.shape), acc + c
            return jax.lax.fori_loop(0, reps, body, (poses, 0.0))
        res["assemble_ms"] = timeit(f"F={F} assemble", loop_assemble, init,
                                    reps=reps)

    if "factor" in stages:
        @jax.jit
        def loop_factor(Ad):
            fac0 = bt_factor(Ad, B0, ns_iters=8, direct_threshold=4)
            w0 = bt_warm_state(fac0)
            def body(i, carry):
                Ad_, w, acc = carry
                fac = bt_factor(Ad_, B0, ns_iters=8, direct_threshold=4,
                                warm=w)
                tA = fac.tail_Hinv
                return (Ad_ + 1e-12 * tA[0, 0], bt_warm_state(fac),
                        acc + tA[0, 0])
            return jax.lax.fori_loop(0, reps, body, (Ad, w0, 0.0))[2]
        res["factor_warm_ms"] = timeit(f"F={F} bt_factor warm", loop_factor,
                                       Ad0, reps=reps)

    if "apply" in stages:
        fac0 = jax.jit(lambda Ad: bt_factor(Ad, B0, ns_iters=8,
                                            direct_threshold=4))(Ad0)
        jax.block_until_ready(fac0.tail_Hinv)
        # jit turns the static int leaves into arrays; restore them so the
        # shape logic in bt_apply stays Python-static
        fac0 = fac0._replace(F_orig=int(fac0.F_orig), Fp=int(fac0.Fp))

        @jax.jit
        def loop_apply_g(g):
            def body(i, carry):
                g_, acc = carry
                y = bt_apply(fac0, -g_[..., None])[..., 0]
                return g_ + 1e-12 * y, acc + y[0, 0]
            return jax.lax.fori_loop(0, reps, body, (g, 0.0))
        res["apply_g_ms"] = timeit(f"F={F} bt_apply g (1 col)", loop_apply_g,
                                   g0, reps=reps)

        @jax.jit
        def loop_apply_U(U):
            def body(i, carry):
                U_, acc = carry
                Y = bt_apply(fac0, U_)
                return (U_ + (1e-12 * acc).astype(U_.dtype) * U_,
                        acc + Y[0, 0, 0].astype(jnp.float32))
            return jax.lax.fori_loop(0, reps, body, (Ub, 0.0))
        res["apply_U_ms"] = timeit(f"F={F} bt_apply U ({C} col bf16)",
                                   loop_apply_U, Ub, reps=reps)

        @jax.jit
        def loop_S(U, g):
            YU = bt_apply(fac0, U.astype(jnp.bfloat16))
            yb0 = bt_apply(fac0, -g[..., None])[..., 0]
            def body(i, carry):
                yb, acc = carry
                S = jnp.eye(C, dtype=jnp.float32) + jnp.einsum(
                    "fmc,fmd->cd", U.astype(YU.dtype), YU,
                    preferred_element_type=jnp.float32)
                Uyb = jnp.einsum("fmc,fm->c", U, yb.astype(U.dtype),
                                 preferred_element_type=jnp.float32)
                Xf = spd_ns_inverse(S, None)
                z = jnp.einsum("cd,d->c", Xf, Uyb)
                for _ in range(2):
                    r = Uyb - jnp.einsum("cd,d->c", S, z)
                    z = z + jnp.einsum("cd,d->c", Xf, r)
                dx = yb - jnp.einsum("fmc,c->fm", YU, z.astype(YU.dtype),
                                     preferred_element_type=jnp.float32)
                return yb + 1e-12 * dx, acc + z[0]
            return jax.lax.fori_loop(0, reps, body, (yb0, 0.0))
        res["S_cap_corr_ms"] = timeit(f"F={F} S+cap+corr", loop_S, U0, g0,
                                      reps=reps)

    if "ns0" in stages:
        from omniswarm_tpu.solver.block_tridiag import ns_inverse_warm

        A_odd0 = Ad0[1::2]
        X0 = jax.jit(lambda a: ns_inverse_warm(a, a * 0 + jnp.eye(
            m, dtype=a.dtype) * 0.01, 8))(A_odd0)
        jax.block_until_ready(X0)

        @jax.jit
        def loop_ns0(A_odd):
            def body(i, carry):
                A_, X, acc = carry
                Xn = ns_inverse_warm(A_, X, 2)
                return A_ + 1e-12 * Xn[0, 0, 0], Xn, acc + Xn[0, 0, 0]
            return jax.lax.fori_loop(0, reps, body, (A_odd, X0, 0.0))[2]
        res["ns0_ms"] = timeit(f"F={F} ns_warm lvl0 ({A_odd0.shape[0]} blk)",
                               loop_ns0, A_odd0, reps=reps)

        @jax.jit
        def loop_level0(Ad):
            def body(i, carry):
                A_, X, acc = carry
                Fl = A_.shape[0]
                A_odd = A_[1::2]
                B_left = B0[0::2]
                B_right = jnp.zeros_like(B_left)
                B_right = B_right.at[:-1].set(B0[1::2])
                Ainv = ns_inverse_warm(A_odd, X, 2)
                W_l = jnp.einsum("tij,tjk->tik", B_left, Ainv)
                W_r = jnp.einsum("tji,tjk->tik", B_right, Ainv)
                A_new = A_[0::2] - jnp.einsum("tij,tkj->tik", W_l, B_left)
                A_new = A_new.at[1:].add(
                    -jnp.einsum("tij,tjk->tik", W_r, B_right)[:-1])
                B_new = -jnp.einsum("tij,tjk->tik", W_l, B_right)[:-1]
                return (A_ + 1e-12 * A_new[0, 0, 0], Ainv,
                        acc + B_new[0, 0, 0])
            return jax.lax.fori_loop(0, reps, body, (Ad, X0, 0.0))[2]
        res["level0_ms"] = timeit(f"F={F} full level0", loop_level0, Ad0,
                                  reps=reps)

    if "smw" in stages:
        import functools as _ft

        smw = _ft.partial(_smw_solve_core, pack=pack)

        @jax.jit
        def loop_smw(g):
            _, w0 = smw(Ad0, B0, g, Ub, lam, None)
            def body(i, carry):
                g_, w, acc = carry
                dx, w = smw(A0, B0, g_, Ub, lam, w)
                return g_ + 1e-12 * dx.reshape(g_.shape), w, acc + dx[0]
            return jax.lax.fori_loop(0, reps, body, (g, w0, 0.0))[2]
        res["smw_warm_ms"] = timeit(f"F={F} smw warm", loop_smw, g0,
                                    reps=reps)

    if "iter" in stages:
        import functools as _ft

        smw_i = _ft.partial(_smw_solve_core, pack=pack)

        @jax.jit
        def loop_iter(poses):
            A_, B_, g_, U_, _ = assemble(poses)
            _, w0 = smw_i(A_, B_, g_, U_.astype(jnp.bfloat16), lam, None)
            def body(i, carry):
                p, w, acc = carry
                A, Boff, g, U, c = assemble(p)
                dx, w = smw_i(A, Boff, g, U.astype(jnp.bfloat16), lam, w)
                return p + 1e-12 * dx.reshape(p.shape), w, acc + c
            return jax.lax.fori_loop(0, reps, body, (poses, w0, 0.0))[2]
        res["iter_warm_ms"] = timeit(f"F={F} full iter warm", loop_iter,
                                     init, reps=reps)

    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default="128,256,512,1024")
    ap.add_argument("--stages", default="assemble,smw,iter")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument("--pack", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (trace debugging)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    stages = set(args.stages.split(","))
    rows = []
    for F in [int(x) for x in args.frames.split(",")]:
        rows.append(profile_F(F, stages, args.reps, pack=args.pack))
    print(json.dumps(rows), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
