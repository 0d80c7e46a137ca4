"""Place-recognition database: sharded matrix + matmul top-k retrieval.

Replaces the reference's two faiss IndexFlatIP databases (local vs remote
keyframes, loop_detector.h:27-29 / loop_detector.cpp:150-242): global
descriptors live in a fixed-capacity (N, D) matrix; a query is one matvec
(inner product on the MXU) with masks for validity, the recency guard
(MATCH_INDEX_DIST: skip keyframes too close in sequence to the query,
loop_detector.cpp:199-207), and own/other-drone filtering; thresholds differ
for local vs remote (init-mode) queries as in the reference.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PlaceDB(NamedTuple):
    desc: jnp.ndarray      # (N, D) unit global descriptors
    drone_id: jnp.ndarray  # (N,) i32
    frame_id: jnp.ndarray  # (N,) i32 — per-drone keyframe sequence number
    valid: jnp.ndarray     # (N,) bool
    cursor: jnp.ndarray    # () i32


def make_placedb(capacity: int, dim: int, dtype=jnp.float32) -> PlaceDB:
    return PlaceDB(
        desc=jnp.zeros((capacity, dim), dtype),
        drone_id=jnp.full((capacity,), -1, jnp.int32),
        frame_id=jnp.full((capacity,), -1, jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        cursor=jnp.zeros((), jnp.int32),
    )


@jax.jit
def add(db: PlaceDB, desc: jnp.ndarray, drone_id: jnp.ndarray,
        frame_id: jnp.ndarray) -> PlaceDB:
    slot = db.cursor % db.desc.shape[0]
    return PlaceDB(
        desc=db.desc.at[slot].set(desc.astype(db.desc.dtype)),
        drone_id=db.drone_id.at[slot].set(drone_id),
        frame_id=db.frame_id.at[slot].set(frame_id),
        valid=db.valid.at[slot].set(True),
        cursor=db.cursor + 1,
    )


@jax.jit
def query(db: PlaceDB, desc: jnp.ndarray, query_drone: jnp.ndarray,
          query_frame: jnp.ndarray, *,
          match_index_dist: jnp.ndarray = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best database hit for one query descriptor.

    Returns (best_index, best_similarity). Entries of the same drone within
    ``match_index_dist`` keyframes of the query are excluded (recency guard);
    the caller applies the local/remote similarity threshold.
    """
    sim = db.desc @ desc                                     # (N,)
    recent = (db.drone_id == query_drone) & (
        jnp.abs(db.frame_id - query_frame) < match_index_dist)
    sim = jnp.where(db.valid & ~recent, sim, -jnp.inf)
    best = jnp.argmax(sim)
    return best.astype(jnp.int32), sim[best]


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def query_topk(db: PlaceDB, desc: jnp.ndarray, query_drone: jnp.ndarray,
               query_frame: jnp.ndarray, *, k: int = 5,
               match_index_dist: jnp.ndarray = 10):
    """Top-k database hits, best first (SEARCH_NEAREST_NUM candidates).

    The reference searches SEARCH_NEAREST_NUM + guard nearest neighbors and
    walks them in similarity order (query_from_database,
    loop_detector.cpp:203-242); invalid/recent entries carry -inf.
    """
    sim = db.desc @ desc                                     # (N,)
    recent = (db.drone_id == query_drone) & (
        jnp.abs(db.frame_id - query_frame) < match_index_dist)
    sim = jnp.where(db.valid & ~recent, sim, -jnp.inf)
    top_sim, top_idx = jax.lax.top_k(sim, min(k, sim.shape[0]))
    return top_idx.astype(jnp.int32), top_sim


@functools.partial(jax.jit, static_argnames=("k",))
def query_topk2(db_a: PlaceDB, db_b: PlaceDB, desc: jnp.ndarray,
                meta: jnp.ndarray, *, k: int = 5):
    """Top-k over TWO databases in ONE dispatch.

    meta: (4,) i32 [query_drone, query_frame, guard_a, guard_b]. Over a
    remote-TPU tunnel every separate upload/download is a round trip;
    the local+remote candidate search (loop_detector.cpp:176-242) is one
    fused program returning both top-k sets.
    """
    k = min(k, db_a.desc.shape[0])          # tiny-capacity DBs

    def one(db, guard):
        sim = db.desc @ desc
        recent = (db.drone_id == meta[0]) & (
            jnp.abs(db.frame_id - meta[1]) < guard)
        sim = jnp.where(db.valid & ~recent, sim, -jnp.inf)
        top_sim, top_idx = jax.lax.top_k(sim, k)
        return top_idx.astype(jnp.int32), top_sim

    ia, sa = one(db_a, meta[2])
    ib, sb = one(db_b, meta[3])
    return ia, sa, ib, sb


@functools.partial(jax.jit, static_argnames=("k",))
def query2_add_batch(db_a: PlaceDB, db_b: PlaceDB, descs: jnp.ndarray,
                     metas: jnp.ndarray, add_sel: jnp.ndarray, *,
                     k: int = 5):
    """Q queries against BOTH databases + masked ring-buffer insert, all
    as ONE dispatch.

    descs: (Q, D) unit query descriptors; metas: (Q, 4) i32
    [drone, frame, guard_a, guard_b]; add_sel: (Q,) i32 — 0 query-only,
    1 insert into db_a, 2 insert into db_b. Inserts happen AFTER the
    queries (batch members don't see each other — the serving batch is
    one instant). Returns (idx_a, sim_a, idx_b, sim_b, db_a', db_b').

    Replaces per-keyframe query + add dispatch pairs: each dispatch +
    download is a ~35 ms round trip over the remote-TPU tunnel.
    """
    k = min(k, db_a.desc.shape[0])          # tiny-capacity DBs

    def one(db, guard_col):
        sims = descs @ db.desc.T                            # (Q, N) — MXU
        recent = (db.drone_id[None, :] == metas[:, 0:1]) & (
            jnp.abs(db.frame_id[None, :] - metas[:, 1:2])
            < metas[:, guard_col:guard_col + 1])
        sims = jnp.where(db.valid[None, :] & ~recent, sims, -jnp.inf)
        top_sim, top_idx = jax.lax.top_k(sims, k)
        return top_idx.astype(jnp.int32), top_sim

    ia, sa = one(db_a, 2)
    ib, sb = one(db_b, 3)

    def insert(db, sel_val):
        m = add_sel == sel_val
        rank = jnp.cumsum(m) - 1                            # insert order
        cap = db.desc.shape[0]
        slot = jnp.where(m, (db.cursor + rank) % cap, cap)  # OOB → drop
        return PlaceDB(
            desc=db.desc.at[slot].set(
                descs.astype(db.desc.dtype), mode="drop"),
            drone_id=db.drone_id.at[slot].set(metas[:, 0], mode="drop"),
            frame_id=db.frame_id.at[slot].set(metas[:, 1], mode="drop"),
            valid=db.valid.at[slot].set(True, mode="drop"),
            cursor=db.cursor + jnp.sum(m),
        )

    return ia, sa, ib, sb, insert(db_a, 1), insert(db_b, 2)


@functools.partial(jax.jit, static_argnames=("k",))
def query2_add_payload_batch(db_a: PlaceDB, db_b: PlaceDB,
                             pay_a: jnp.ndarray, pay_b: jnp.ndarray,
                             descs: jnp.ndarray, metas: jnp.ndarray,
                             add_sel: jnp.ndarray, qpacks: jnp.ndarray, *,
                             k: int = 5):
    """query2_add_batch + DEVICE-RESIDENT landmark-payload rings.

    pay_a/pay_b: (N, Kb, P) f16 rings mirroring the descriptor ring slots
    — each keyframe's packed landmark payload (local descs + validity +
    pixels + 3-D points, loop_detector._unpack_kf layout) lives in HBM so
    the geometric-verify dispatch can GATHER candidates by index instead
    of the host re-uploading (C, Kb, P) packs every tick (~MBs at 30 MB/s
    over the remote tunnel — the dominant share of r4's 216 ms keyframe
    latency). qpacks: (Q, Kb, P) f16, scattered at the same insert slots.

    Returns (idx_a, sim_a, idx_b, sim_b, db_a', db_b', pay_a', pay_b').
    """
    ia, sa, ib, sb, na, nb = query2_add_batch(
        db_a, db_b, descs, metas, add_sel, k=k)

    def scatter(db, pay, sel_val):
        m = add_sel == sel_val
        rank = jnp.cumsum(m) - 1
        cap = pay.shape[0]
        slot = jnp.where(m, (db.cursor + rank) % cap, cap)
        return pay.at[slot].set(qpacks.astype(pay.dtype), mode="drop")

    return (ia, sa, ib, sb, na, nb,
            scatter(db_a, pay_a, 1), scatter(db_b, pay_b, 2))


@jax.jit
def query_batch(db: PlaceDB, desc: jnp.ndarray, query_drone: jnp.ndarray,
                query_frame: jnp.ndarray, *,
                match_index_dist: jnp.ndarray = 10):
    """Batched retrieval: desc (B, D) → (best_idx (B,), best_sim (B,))."""
    sim = desc @ db.desc.T                                   # (B, N) — MXU
    recent = (db.drone_id[None, :] == query_drone[:, None]) & (
        jnp.abs(db.frame_id[None, :] - query_frame[:, None]) < match_index_dist)
    sim = jnp.where(db.valid[None, :] & ~recent, sim, -jnp.inf)
    best = jnp.argmax(sim, axis=1)
    return best.astype(jnp.int32), jnp.take_along_axis(
        sim, best[:, None], axis=1)[:, 0]
