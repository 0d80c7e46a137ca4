"""Collective-traffic accounting + chips-vs-window crossover model.

VERDICT r3 item 4b: the frame-sharded window solver has correctness
artifacts but no quantitative communication story. This tool compiles ONE
LM iteration of the frame-sharded path (parallel/sharded_window.py) on a
virtual N-device mesh, parses the compiled HLO for collective ops
(all-reduce / collective-permute / all-gather / reduce-scatter), and sums
their payload bytes — exact per-iteration communication, straight from
the compiler, no tracing on hardware needed.

It then combines that with the MEASURED single-chip iteration times
(BENCH kf1024 + headline) and published v5e interconnect numbers into a
predicted N-chip iteration time:

    t_N(F) = t_1(F) / N  +  sum(bytes_c / bw_ici)  +  n_coll * t_lat

(all collectives on this path are sequential — the SPIKE reduction's
ppermutes and the capacitance psum gate each other), and reports the
window size where N chips beat 1. The fleet layout (batch-axis sharding,
parallel/swarm_batch.py) is compiled the same way to verify it contains
ZERO collectives.

Run on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8
            python tools/comm_model.py --out COMM_MODEL.json
"""
from __future__ import annotations

import argparse
import functools
import json
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}

_COLLECTIVES = ("all-reduce", "collective-permute", "all-gather",
                "reduce-scatter", "all-to-all")


def hlo_collectives(hlo: str):
    """Parse collective ops + payload bytes from HLO text.

    Counts every `%op = TYPE[SHAPE]{...} collective(...)` instruction;
    tuple-typed results (grouped all-reduces) sum their element buffers.
    """
    out = []
    # result type can be a tuple: (f32[4,4], f32[8]) all-reduce(...)
    pat = re.compile(
        r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*)\s+(%?("
        + "|".join(_COLLECTIVES) + r"))\b")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in pat.finditer(hlo):
        ty, op = m.group(1), m.group(3)
        bytes_ = 0
        for dt, dims in shape_pat.findall(ty):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_ += n * _DTYPE_BYTES[dt]
        out.append((op, bytes_))
    return out


def sharded_iter_hlo(F: int, D: int, n_dev: int, loop_every: int = 16):
    """Compile one frame-sharded LM iteration; return (hlo_text, meta)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from omniswarm_tpu import sim
    from omniswarm_tpu.parallel.sharded_window import (
        _assemble_sharded, _graph_specs, _smw_spike, pad_graph_frames)
    from omniswarm_tpu.solver.dense import dense_graph_from_sim

    data = sim.generate(sim.SimParams(num_drones=D, num_frames=F, seed=2,
                                      loop_every=loop_every))
    graph = dense_graph_from_sim(data)
    poses0 = jnp.asarray(data.vio, jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("frames",))
    graph, poses0, _ = pad_graph_frames(graph, poses0, n_dev)

    def one_iter(g, poses):
        A, B, gf, U, cost_p, B_left = _assemble_sharded(
            g, poses, axis="frames", huber_delta=1.0,
            det_sphere_std=0.1, det_inv_dep_std=0.5)
        import jax as _jax
        cost = _jax.lax.psum(cost_p, "frames")
        dx = _smw_spike(A, B, gf, U, jnp.asarray(1e-4, jnp.float32),
                        axis="frames", B_left=B_left)
        return dx, cost

    fn = jax.jit(jax.shard_map(
        one_iter, mesh=mesh,
        in_specs=(_graph_specs(graph, "frames"), P("frames")),
        out_specs=(P("frames"), P()), check_vma=False))
    hlo = fn.lower(graph, poses0).compile().as_text()
    C = int(4 * len(data.loops))
    return hlo, {"F": F, "D": D, "loops": len(data.loops),
                 "woodbury_cols": C}


def fleet_hlo(n_dev: int):
    """Compile the fleet batch-axis layout; must contain no collectives."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from omniswarm_tpu import sim
    from omniswarm_tpu.parallel.swarm_batch import (
        lm_solve_multigraph, stack_graphs)
    from omniswarm_tpu.solver.dense import dense_graph_from_sim

    lanes, inits = [], []
    for s in range(n_dev):
        d = sim.generate(sim.SimParams(num_drones=5, num_frames=32,
                                       seed=20 + s))
        # common loop capacity: stack_graphs needs same-shape lanes
        lanes.append(dense_graph_from_sim(d, max_loops=64))
        inits.append(np.asarray(d.vio, np.float32))
    stacked = stack_graphs(lanes)
    poses0 = jnp.asarray(np.stack(inits, 0))
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("fleet",))
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P("fleet"))
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard), stacked)
    poses0 = jax.device_put(poses0, shard)
    lowered = jax.jit(
        lambda g, p: lm_solve_multigraph(g, p, max_iterations=5).cost
    ).lower(stacked, poses0).compile().as_text()
    return lowered


# v5e interconnect (public "How to Scale Your Model" numbers): 2D torus,
# one-way ICI bandwidth per link ~4.5e10 B/s; per-collective launch
# latency ~1 us (we report a 1-5 us band).
ICI_BW = 4.5e10
LAT_LO, LAT_HI = 1e-6, 5e-6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--out", default="COMM_MODEL.json")
    args = ap.parse_args()

    import jax

    # must run BEFORE anything initializes a backend (sitecustomize
    # preloads jax; jax.devices()/default_backend() would lock it in)
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", args.ndev)
    except RuntimeError:
        pass                        # backend already up (e.g. XLA_FLAGS)
    assert len(jax.devices()) >= args.ndev, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8")

    # measured single-chip per-iteration times (BENCH_r03/r04, v5e)
    t1_ms = {100: 0.48, 1024: 2.104}

    rows = []
    for F in (256, 512, 1024):
        hlo, meta = sharded_iter_hlo(F, 5, args.ndev)
        colls = hlo_collectives(hlo)
        by_op = {}
        for op, b in colls:
            by_op.setdefault(op, [0, 0])
            by_op[op][0] += 1
            by_op[op][1] += b
        total_bytes = sum(b for _, b in colls)
        n_coll = len(colls)
        # single-chip time: linear frame scaling anchored at kf1024
        t1 = t1_ms[1024] * F / 1024 if F > 100 else t1_ms[100]
        t_comm_lo = total_bytes / ICI_BW * 1e3 + n_coll * LAT_LO * 1e3
        t_comm_hi = total_bytes / ICI_BW * 1e3 + n_coll * LAT_HI * 1e3
        tn_lo = t1 / args.ndev + t_comm_lo
        tn_hi = t1 / args.ndev + t_comm_hi
        rows.append({
            "F": F, **meta,
            "collectives_per_iter": n_coll,
            "collective_bytes_per_iter": total_bytes,
            "by_op": {k: {"count": v[0], "bytes": v[1]}
                      for k, v in by_op.items()},
            "t1_ms_per_iter": round(t1, 3),
            "t8_ms_per_iter_pred": [round(tn_lo, 3), round(tn_hi, 3)],
            "speedup_pred": [round(t1 / tn_hi, 2), round(t1 / tn_lo, 2)],
        })
        print(f"[comm-model] F={F}: {n_coll} collectives/iter, "
              f"{total_bytes / 1024:.1f} KiB/iter, t1={t1:.2f} ms, "
              f"t8 pred [{tn_lo:.2f}, {tn_hi:.2f}] ms", flush=True)

    # crossover: comm cost is ~F-independent (level count grows log F,
    # capacitance with loop density) while t1 grows linearly — solve for
    # t1(F)/1 == t1(F)/N + t_comm using the F=1024 comm numbers
    r = rows[-1]
    per_frame_ms = t1_ms[1024] / 1024
    denom = per_frame_ms * (1 - 1 / args.ndev)
    f_cross = [round((r["collective_bytes_per_iter"] / ICI_BW * 1e3
                      + r["collectives_per_iter"] * lat * 1e3) / denom)
               for lat in (LAT_LO, LAT_HI)]

    fleet_text = fleet_hlo(args.ndev)
    fleet_colls = hlo_collectives(fleet_text)
    # the lock-step LM while_loop's convergence flag must agree across
    # shards: a 1-byte pred[] all-reduce per iteration. That's control
    # flow, not data exchange — classify separately.
    fleet_data = [(op, b) for op, b in fleet_colls if b > 1]
    result = {
        "description": "Per-iteration collective traffic of the "
                       "frame-sharded window solver (compiled HLO, "
                       "virtual 8-dev mesh) + predicted v5e crossover",
        "ndev": args.ndev,
        "ici_bw_bytes_per_s": ICI_BW,
        "latency_band_s": [LAT_LO, LAT_HI],
        "frame_sharded": rows,
        "crossover_F_pred": {"lat_1us": f_cross[0], "lat_5us": f_cross[1]},
        "fleet_layout_collectives": len(fleet_colls),
        "fleet_layout_control_flag_bytes": sum(
            b for _, b in fleet_colls) - sum(b for _, b in fleet_data),
        "fleet_layout_data_collectives": len(fleet_data),
        "fleet_layout_zero_data_collectives": len(fleet_data) == 0,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "frame_sharded"}), flush=True)


if __name__ == "__main__":
    main()
