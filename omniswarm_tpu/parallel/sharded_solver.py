"""Distributed bundle adjustment over a TPU device mesh.

The TPU-native replacement for the reference's single-CPU Ceres solve: factor
families are sharded on their leading (factor) axis across the mesh, every
device evaluates residuals/Jacobians for its shard only, the block normal
equations are reduced with ``psum`` over ICI, and the (comparatively tiny)
dense solve runs replicated on all devices. This is the
communication-avoiding layout for sliding-window-sized states: one (P, P)
all-reduce per LM iteration, zero communication during factor evaluation.

The swarm-level analog: "one drone = one shard group" — each drone's
measurements live on its shard, matching the reference's decentralized
work-partitioning semantics (SURVEY §2.5) while the collective supplies the
measurement exchange that LCM/UWB multicast provides in the reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from omniswarm_tpu.solver.gauss_newton import SolveResult, lm_solve_impl
from omniswarm_tpu.solver.graph import (
    DetectionFactors,
    FactorGraph,
    RangeFactors,
    RelPoseFactors,
)

AXIS = "factors"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def graph_in_specs(axis: str = AXIS) -> FactorGraph:
    """PartitionSpec pytree: factor arrays sharded, pose masks replicated."""
    s, r = P(axis), P()
    return FactorGraph(
        ranges=RangeFactors(s, s, s, s, s, s),
        odoms=RelPoseFactors(s, s, s, s, s, s, s),
        loops=RelPoseFactors(s, s, s, s, s, s, s),
        dets=DetectionFactors(s, s, s, s, s, s, s, s, s, s, s),
        pose_valid=r,
        pose_fixed=r,
        yaw_fixed=r,
        ant_pos=r,
    )


def _pad_axis0(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def shard_graph_factors(graph: FactorGraph, n_shards: int) -> FactorGraph:
    """Pad factor capacities so each family divides the mesh size.

    Padded slots have valid=False so they contribute nothing.
    """

    def pad_family(fam):
        return type(fam)(*(_pad_axis0(x, n_shards) for x in fam))

    return graph._replace(
        ranges=pad_family(graph.ranges),
        odoms=pad_family(graph.odoms),
        loops=pad_family(graph.loops),
        dets=pad_family(graph.dets),
    )


def sharded_lm_solve(graph: FactorGraph, poses0: jnp.ndarray, mesh: Mesh,
                     **solve_kwargs) -> SolveResult:
    """LM solve with factor evaluation sharded over ``mesh``.

    graph capacities must be divisible by the mesh size (use
    ``shard_graph_factors``). poses0 is replicated; the result is replicated.
    """
    axis = mesh.axis_names[0]
    graph = shard_graph_factors(graph, mesh.devices.size)
    fn = jax.jit(
        jax.shard_map(
            functools.partial(lm_solve_impl, axis_name=axis, **solve_kwargs),
            mesh=mesh,
            in_specs=(graph_in_specs(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    return fn(graph, poses0)
