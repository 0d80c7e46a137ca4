"""Pallas TPU kernels for frontend hot ops.

These are the hand-scheduled versions of ops that XLA otherwise executes as
several passes; they keep the whole working set in VMEM:

- ``grid_nms_pallas``: separable (2r+1)^2 window-max non-maximum suppression
  of the SuperPoint heat map (replaces reduce_window + compare + select —
  one kernel, one VMEM residency). Reference behavior: NMS2 grid
  suppression, superpoint_tensorrt.cpp:237-309.
- ``retrieval_top1_pallas``: fused database matvec + masked argmax for
  place recognition (query path of ops/placedb.py) — the (N, D) descriptor
  matrix streams through the MXU and the reduction never leaves VMEM.

Kernels run compiled on TPU; on CPU test platforms they run in interpreter
mode (``interpret=True`` chosen automatically).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _shift_rows_max(m, h, d):
    """max(m, h shifted down by d rows) with -inf fill (no wraparound)."""
    H = h.shape[0]
    rolled = pltpu.roll(h, shift=d % H, axis=0) if not _interpret() else \
        jnp.roll(h, d, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    if d > 0:
        valid = rows >= d
    else:
        valid = rows < H + d
    return jnp.maximum(m, jnp.where(valid, rolled, -jnp.inf))


def _shift_cols_max(m, h, d):
    W = h.shape[1]
    rolled = pltpu.roll(h, shift=d % W, axis=1) if not _interpret() else \
        jnp.roll(h, d, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    if d > 0:
        valid = cols >= d
    else:
        valid = cols < W + d
    return jnp.maximum(m, jnp.where(valid, rolled, -jnp.inf))


def _nms_kernel(r: int, heat_ref, out_ref):
    h = heat_ref[:]
    # separable window max: rows then cols
    rowmax = h
    for d in range(1, r + 1):
        rowmax = _shift_rows_max(rowmax, h, d)
        rowmax = _shift_rows_max(rowmax, h, -d)
    winmax = rowmax
    for d in range(1, r + 1):
        winmax = _shift_cols_max(winmax, rowmax, d)
        winmax = _shift_cols_max(winmax, rowmax, -d)
    out_ref[:] = jnp.where(h >= winmax, h, 0.0)


@functools.partial(jax.jit, static_argnames=("nms_dist",))
def grid_nms_pallas(heat: jnp.ndarray, nms_dist: int = 4) -> jnp.ndarray:
    """Window-max NMS of a (H, W) heat map, fully in VMEM."""
    return pl.pallas_call(
        functools.partial(_nms_kernel, nms_dist),
        out_shape=jax.ShapeDtypeStruct(heat.shape, heat.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(heat)


def _retrieval_kernel(chunk: int, db_ref, q_ref, mask_ref, sim_ref, best_ref):
    i = pl.program_id(0)
    sims = jnp.dot(db_ref[:], q_ref[:],
                   preferred_element_type=jnp.float32)       # (chunk, 1)
    sims = jnp.where(mask_ref[:] > 0, sims, -jnp.inf)[:, 0]
    local_best = jnp.argmax(sims).astype(jnp.int32)
    local_max = jnp.max(sims)

    @pl.when(i == 0)
    def _():
        sim_ref[0] = local_max
        best_ref[0] = local_best

    @pl.when((i > 0) & (local_max > sim_ref[0]))
    def _():
        sim_ref[0] = local_max
        best_ref[0] = i * chunk + local_best


@functools.partial(jax.jit, static_argnames=("chunk",))
def retrieval_top1_pallas(db: jnp.ndarray, query: jnp.ndarray,
                          mask: jnp.ndarray, *, chunk: int = 256):
    """Fused (N, D) @ (D,) + masked argmax, tiled over DB row chunks.

    The database streams through VMEM one chunk per sequential grid step;
    the running (best_sim, best_idx) lives in SMEM outputs across steps.
    Returns (best_idx, best_sim).
    """
    N = db.shape[0]
    chunk = min(chunk, N)
    grid = pl.cdiv(N, chunk)
    sim, best = pl.pallas_call(
        functools.partial(_retrieval_kernel, chunk),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((chunk, db.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db.shape[1], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=_interpret(),
    )(db, query[:, None], mask[:, None].astype(jnp.float32))
    return best[0], sim[0]
