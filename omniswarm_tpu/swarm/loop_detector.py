"""Loop recognition + geometric verification pipeline.

The TPU-native re-design of the reference's LoopDetector
(/root/reference/swarm_loop/src/loop_detector.cpp): on every keyframe
(local or received from a peer over LoopNet),

1. query the place-recognition databases — **split local/remote** like the
   reference's two faiss IndexFlatIP indices (loop_detector.h:27-29,
   REMOTE_MAGIN_NUMBER :22): self keyframes live in the local DB, peer
   keyframes in the remote DB. Query routing follows query_from_database
   (:176-201): remote keyframes query the local DB; self keyframes query
   the local DB (with the MATCH_INDEX_DIST recency guard) and the remote
   DB; self non-keyframes query only the remote DB. Top
   ``search_nearest_num`` candidates are walked best-first (:203-242).
2. per-mode thresholds: init mode (an inter-drone pair with fewer than
   ``inter_drone_init_frames`` accepted loops) relaxes the NetVLAD
   similarity gate (INIT_MODE_PRODUCT_THRES) and the inlier minimum
   (INIT_MODE_MIN_LOOP_NUM) — swarm_loop.cpp:221-238, loop_detector.cpp:66-72.
3. mutual-NN match local descriptors (compute_correspond_features :431-537
   → ops/matching matmul), then **homography-RANSAC pre-filter** the
   matches in pixel space (cv::findHomography(..., CV_RANSAC, 3, mask)
   :539-624 → ops/homography batched DLT hypotheses);
4. solve the 4-DoF relative pose by vmapped PnP RANSAC (ops/ransac);
5. verify: inlier count, relative-pose magnitude/yaw gates
   (pnp_result_verify :317-335), and the **covariance-scaled** intra-drone
   odometry-consistency gate (check_loop_odometry_consistency :295-315):
   Mahalanobis distance of (loop ⊖ odometry) under drift + loop covariance.
6. add the keyframe to its database (unless ``prevent_adding_db`` — the
   min-movement non-keyframe path, swarm_loop.cpp:155-158).

Keyframe content arrives as swarm.comm.KeyframeData; outputs are
LoopEdgePacket-shaped records ready for broadcast + the back-end.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.ops import placedb
from omniswarm_tpu.ops.homography import homography_ransac
from omniswarm_tpu.ops.matching import mutual_match
from omniswarm_tpu.ops.ransac import pnp_ransac_4dof
from omniswarm_tpu.sim.simulator import delta_pose_np, wrap
from omniswarm_tpu.swarm.comm import KeyframeData, LoopEdgePacket


import functools


def _verify_body(desc_a, valid_a, kp_a, p3d_a,
                 desc_b, valid_b, kp_b, p3d_b, key,
                 *, pnp_hyp: int, use_hom: bool, pnp_err, hom_err):
    """Geometric verification of one candidate keyframe (traceable body).

    Fuses mutual-NN matching (MXU matmul), the optional homography-RANSAC
    pixel pre-filter (loop_detector.cpp:539-624) and 4-DoF PnP RANSAC.
    """
    m = mutual_match(desc_a, desc_b, valid_a, valid_b, min_similarity=0.5)
    k1, k2 = jax.random.split(key)
    if use_hom:
        pbm = kp_b[m.idx_b]
        h = homography_ransac(kp_a, pbm, m.mask, k1, err_thresh=hom_err)
        # apply the filter only when a single homography explains most
        # matches: distorted (fisheye) pixels are NOT homography-related
        # even for planar scenes — a low-consensus H would mask good
        # matches (measured: 72% consensus pinhole vs 29% MEI fisheye)
        keep = (h.num_inliers >= 8) & \
            (h.num_inliers >= 0.5 * jnp.sum(m.mask))
        mask = jnp.where(keep, m.mask & h.inliers, m.mask)
    else:
        mask = m.mask
    old_p3d = p3d_b[m.idx_b]
    norms = jnp.linalg.norm(old_p3d, axis=1)
    bearings = old_p3d / jnp.maximum(norms[:, None], 1e-6)
    valid = mask & (norms > 1e-3) & (jnp.linalg.norm(p3d_a, axis=1) > 1e-3)
    res = pnp_ransac_4dof(p3d_a, bearings, valid, k2,
                          err_thresh=pnp_err, num_hypotheses=pnp_hyp)
    return (m.idx_b, m.mask, mask, jnp.sum(m.mask), jnp.sum(valid),
            res.dpose, res.num_inliers, res.inliers)


@functools.partial(jax.jit,
                   static_argnames=("pnp_hyp", "use_hom"))
def _verify_one_kernel(desc_a, valid_a, kp_a, p3d_a,
                       desc_b, valid_b, kp_b, p3d_b, key,
                       *, pnp_hyp: int, use_hom: bool,
                       pnp_err, hom_err):
    """ONE candidate verification as one XLA dispatch (the eager per-op
    walk cost dozens of round trips per candidate over the remote-TPU
    tunnel)."""
    return _verify_body(desc_a, valid_a, kp_a, p3d_a,
                        desc_b, valid_b, kp_b, p3d_b, key,
                        pnp_hyp=pnp_hyp, use_hom=use_hom,
                        pnp_err=pnp_err, hom_err=hom_err)


def _unpack_kf(packed):
    """(… , Kb, Cdim+6) packed rows → (desc, valid, kp, p3d)."""
    cdim = packed.shape[-1] - 6
    return (packed[..., :cdim], packed[..., cdim] > 0.5,
            packed[..., cdim + 1:cdim + 3], packed[..., cdim + 3:cdim + 6])


@functools.partial(jax.jit,
                   static_argnames=("pnp_hyp", "use_hom"))
def _verify_batch_kernel(query_packed, cands_packed, seed,
                         *, pnp_hyp: int, use_hom: bool,
                         pnp_err, hom_err):
    """Verify a FIXED-C batch of candidates in one XLA dispatch.

    The r1-documented C-way compile blowup applied to vmapping the
    data-dependent candidate *walk*; this fixed-shape batched verify
    compiles once per (C, K) bucket and replaces C sequential dispatches
    with one (VERDICT r3 item 2). Padded candidate rows carry zero
    descriptors → zero matches → they fail every host-side gate.

    Transfers are packed — query (Kb, Cdim+6), candidates
    (C, Kb, Cdim+6), a host-counter RNG seed — because every separate
    upload is a round trip over the remote-TPU tunnel.
    """
    desc_a, valid_a, kp_a, p3d_a = _unpack_kf(query_packed)
    descs_b, valids_b, kps_b, p3ds_b = _unpack_kf(cands_packed)
    C = cands_packed.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), C)
    return jax.vmap(
        lambda db, vb, kb, pb, k: _verify_body(
            desc_a, valid_a, kp_a, p3d_a, db, vb, kb, pb, k,
            pnp_hyp=pnp_hyp, use_hom=use_hom,
            pnp_err=pnp_err, hom_err=hom_err)
    )(descs_b, valids_b, kps_b, p3ds_b, keys)


def _verify_multi_kernel_impl(qpacks, cpacks, seed,
                              *, pnp_hyp: int, use_hom: bool,
                              pnp_err, hom_err):
    Q, C = cpacks.shape[:2]
    keys = jax.random.split(jax.random.PRNGKey(seed), Q * C)
    keys = keys.reshape((Q, C) + keys.shape[1:])

    def per_query(qp, cp, ks):
        da, va, ka_, pa = _unpack_kf(qp)
        db, vb, kb, pb = _unpack_kf(cp)
        return jax.vmap(
            lambda d_, v_, k_, p_, key: _verify_body(
                da, va, ka_, pa, d_, v_, k_, p_, key,
                pnp_hyp=pnp_hyp, use_hom=use_hom,
                pnp_err=pnp_err, hom_err=hom_err)
        )(db, vb, kb, pb, ks)

    return jax.vmap(per_query)(qpacks, cpacks, keys)


@functools.partial(jax.jit,
                   static_argnames=("pnp_hyp", "use_hom"))
def _verify_multi_kernel(qpacks, cpacks, seed,
                         *, pnp_hyp: int, use_hom: bool,
                         pnp_err, hom_err):
    """Verify Q queries × C candidates in ONE dispatch.

    qpacks: (Q, Kb, Cdim+6) f16, cpacks: (Q, C, Kb, Cdim+6) f16 — the
    serving batch for one comm-scan tick (a node's received remote
    keyframes, plus its own). Two fused dispatches per tick replace
    ~3 round trips per keyframe (~35 ms each over the tunnel).
    """
    return _verify_multi_kernel_impl(
        qpacks.astype(jnp.float32), cpacks.astype(jnp.float32), seed,
        pnp_hyp=pnp_hyp, use_hom=use_hom,
        pnp_err=pnp_err, hom_err=hom_err)


@functools.partial(jax.jit,
                   static_argnames=("k", "pnp_hyp", "use_hom", "all_lanes"))
def _tick_kernel(db_a, db_b, pay_a, pay_b, descs, metas, add_sel, qpacks,
                 use_ab, floor, over_a, over_b, seed,
                 *, k: int, pnp_hyp: int, use_hom: bool,
                 pnp_err, hom_err, all_lanes: bool = False):
    """The WHOLE detector serving tick as ONE dispatch.

    Retrieval (both DBs), ring inserts (descriptors + payloads),
    candidate merge (top-k over local+remote with floor/validity/
    overwrite masks), and geometric verification of every survivor —
    fused so a keyframe batch costs exactly one upload + one download
    round over the tunnel (the r5 two-dispatch path still paid an extra
    ~35 ms RTT to bounce candidate indices through the host).

    use_ab: (Q, 2) bool — query i may match db_a / db_b;
    floor: scalar retrieval floor (min of the mode thresholds);
    over_a/over_b: (N,) bool — slots this batch's inserts overwrite
    (their ring payload now belongs to the NEW keyframe → excluded).
    Returns (src, slot, sim, verify outputs...) with src -1 on padded
    candidate lanes.
    """
    from omniswarm_tpu.ops import placedb as _pdb

    out = _pdb.query2_add_payload_batch(
        db_a, db_b, pay_a, pay_b, descs, metas, add_sel, qpacks, k=k)
    ia, sa, ib, sb, na, nb, pa2, pb2 = out
    kk = ia.shape[1]
    # mask: floor, per-query db usage, overwritten slots
    sa = jnp.where(use_ab[:, 0:1] & (sa >= floor) & ~over_a[ia],
                   sa, -jnp.inf)
    sb = jnp.where(use_ab[:, 1:2] & (sb >= floor) & ~over_b[ib],
                   sb, -jnp.inf)
    sims = jnp.concatenate([sa, sb], axis=1)             # (Q, 2k)
    # all_lanes: keep every per-DB top-k lane (balanced_db_candidates) —
    # top_k over all 2k lanes is just a sort, so src/slot logic is shared
    C = sims.shape[1] if all_lanes else min(k, sims.shape[1])
    top_sim, pos = jax.lax.top_k(sims, C)
    src = jnp.where(pos >= kk, 1, 0)
    slot = jnp.where(pos >= kk,
                     jnp.take_along_axis(ib, jnp.maximum(pos - kk, 0), 1),
                     jnp.take_along_axis(ia, jnp.minimum(pos, kk - 1), 1))
    src = jnp.where(jnp.isfinite(top_sim), src, -1)
    verify = _gather_verify(qpacks, pa2, pb2, src, slot, seed,
                            pnp_hyp=pnp_hyp, use_hom=use_hom,
                            pnp_err=pnp_err, hom_err=hom_err)
    return (src, slot, top_sim) + tuple(verify) + (na, nb, pa2, pb2)


def _gather_verify(qpacks, pay_a, pay_b, src, idx, seed,
                   *, pnp_hyp: int, use_hom: bool, pnp_err, hom_err):
    N = pay_a.shape[0]
    store = jnp.concatenate([pay_a, pay_b], 0)           # (2N, Kb, P)
    gidx = jnp.clip(idx + jnp.maximum(src, 0) * N, 0, 2 * N - 1)
    cpacks = store[gidx]                                 # (Q, C, Kb, P)
    cpacks = jnp.where((src >= 0)[..., None, None], cpacks, 0)
    return _verify_multi_kernel_impl(
        qpacks.astype(jnp.float32), cpacks.astype(jnp.float32), seed,
        pnp_hyp=pnp_hyp, use_hom=use_hom,
        pnp_err=pnp_err, hom_err=hom_err)




@dataclass
class LoopCandidate:
    edge: LoopEdgePacket
    num_inliers: int
    similarity: float


class LoopDetector:
    def __init__(self, self_id: int, params: Optional[FrontendParams] = None,
                 *, global_dim: int = 4096, local_dim: int = 64, seed: int = 0,
                 match_viz_dir: Optional[str] = None):
        self.self_id = self_id
        self.p = params or FrontendParams()
        # local vs remote descriptor databases (loop_detector.h:27-29)
        self.local_db = placedb.make_placedb(self.p.max_db_size, global_dim)
        self.remote_db = placedb.make_placedb(self.p.max_db_size, global_dim)
        self.local_kfs: Dict[int, KeyframeData] = {}   # slot -> keyframe
        self.remote_kfs: Dict[int, KeyframeData] = {}
        # host-side mirrors of the DB cursors: int(db.cursor) is a device
        # sync (a full round trip each over the remote-TPU tunnel)
        self._local_count = 0
        self._remote_count = 0
        self.pair_loop_count: Dict[Tuple[int, int], int] = {}
        # device-resident landmark-payload rings (batch serving path):
        # lazily sized (max_db_size, Kb, Cdim+6) f16 on the first batch —
        # candidates gather by index on device instead of the host
        # re-uploading every candidate pack each tick
        self._pay_local = None
        self._pay_remote = None
        self._key = jax.random.PRNGKey(seed)
        # host-side RNG seed base for the batched verify kernel: deriving
        # subkeys with jax.random.split is itself a device dispatch (a
        # round trip per keyframe over the tunnel)
        self._seed0 = np.uint32((seed * 1_000_003 + 12345) & 0x7FFFFFFF)
        self._seed_counter = 0
        self.num_queries = 0
        self.num_loops = 0
        # opt-in loop-match PNG dumps (loop_detector.cpp:695-785 DEBUG_IMAGE)
        self.match_viz_dir = match_viz_dir
        self._images: Dict[Tuple[int, int], np.ndarray] = {}

    # back-compat alias: the combined keyframe map
    @property
    def keyframes(self) -> Dict[int, KeyframeData]:
        merged = dict(self.remote_kfs)
        merged.update(self.local_kfs)
        return merged

    def register_image(self, drone_id: int, frame_id: int,
                       image: np.ndarray) -> None:
        """Keep a keyframe's image for match visualization (opt-in)."""
        if self.match_viz_dir is None:
            return
        if len(self._images) >= self.p.max_db_size:
            self._images.pop(next(iter(self._images)))
        self._images[(int(drone_id), int(frame_id))] = np.asarray(image)

    # ------------------------------------------------------------------
    def _init_mode(self, remote_drone: int) -> bool:
        """Relaxed-gate mode until the pair with self has enough loops
        (loop_detector.cpp:66-72)."""
        if remote_drone == self.self_id:
            return False
        pair = (min(remote_drone, self.self_id),
                max(remote_drone, self.self_id))
        return self.pair_loop_count.get(pair, 0) \
            < self.p.inter_drone_init_frames

    def _thresholds(self, init_mode: bool) -> Tuple[float, int]:
        if init_mode:
            return self.p.netvlad_init_thres, self.p.min_loop_matches_init
        return self.p.netvlad_thres, self.p.min_loop_matches

    def on_keyframe(self, kf: KeyframeData,
                    ego_pose_old: Optional[np.ndarray] = None,
                    prevent_adding_db: bool = False
                    ) -> Optional[LoopCandidate]:
        """Process one keyframe: query → verify → add to DB.

        Returns the best verified loop candidate or None (single-loop
        compatibility surface over ``on_keyframe_multi``).
        ``prevent_adding_db`` marks match-only non-keyframes (small
        movement, swarm_loop.cpp:158)."""
        results = self.on_keyframe_multi(
            kf, prevent_adding_db=prevent_adding_db)
        return results[0] if results else None

    def on_keyframe_multi(self, kf: KeyframeData,
                          prevent_adding_db: bool = False
                          ) -> list:
        """Process one keyframe, returning ALL accepted loop candidates
        (≤ max_loops_per_query, best-similarity first).

        The reference's candidate walk stops at the first verified loop
        (loop_detector.cpp:203-242) — at most one edge per keyframe; with
        the batched verify every top-k candidate is already scored, so
        accepting the verified runners-up costs nothing and roughly
        doubles revisit recall (VERDICT r3 weak #5)."""
        if self.p.verify_batch:
            # unified serving path: query+insert fused, one verify
            # dispatch (2 round trips total)
            return self.on_keyframes_batch([kf], [prevent_adding_db])[0]
        results = self._query_and_verify(kf, nonkeyframe=prevent_adding_db)
        # add AFTER query so a frame never matches itself
        if not prevent_adding_db:
            if kf.drone_id == self.self_id:
                slot = self._local_count % self.p.max_db_size
                self.local_db = placedb.add(
                    self.local_db, jnp.asarray(kf.global_desc, jnp.float32),
                    jnp.asarray(kf.drone_id), jnp.asarray(kf.frame_id))
                self.local_kfs[slot] = kf
                self._local_count += 1
            else:
                slot = self._remote_count % self.p.max_db_size
                self.remote_db = placedb.add(
                    self.remote_db, jnp.asarray(kf.global_desc, jnp.float32),
                    jnp.asarray(kf.drone_id), jnp.asarray(kf.frame_id))
                self.remote_kfs[slot] = kf
                self._remote_count += 1
        for result in results:
            pair = (min(result.edge.drone_a, result.edge.drone_b),
                    max(result.edge.drone_a, result.edge.drone_b))
            self.pair_loop_count[pair] = self.pair_loop_count.get(pair, 0) + 1
            self.num_loops += 1
        return results

    # ------------------------------------------------------------------
    def on_keyframes_batch(self, kfs, prevent_flags=None) -> list:
        """Process MANY keyframes with TWO fused dispatches total.

        The serving batch for one comm-scan tick: all remote keyframes a
        node received (plus optionally its own). Dispatch 1 queries both
        databases for every keyframe AND ring-inserts the batch — global
        descriptors AND packed landmark payloads — on device
        (placedb.query2_add_payload_batch; queries see the pre-batch
        database, batch members don't see each other). Dispatch 2
        geometrically verifies every (query, candidate) pair with the
        candidate payloads GATHERED from the device rings by index
        (_verify_multi_gather_kernel) — the host uploads each keyframe's
        payload exactly once, ever, instead of re-uploading every
        candidate pack every tick (r4: (Q, C, Kb, P) f16 ≈ MBs/tick over
        a ~30 MB/s tunnel — most of the 216 ms keyframe latency).
        Returns a list of lists of accepted LoopCandidates, aligned with
        ``kfs``. Falls back to the sequential path when verify_batch is
        off."""
        p = self.p
        if prevent_flags is None:
            prevent_flags = [False] * len(kfs)
        if not kfs:
            return []
        if not p.verify_batch:
            return [self.on_keyframe_multi(kf, prevent_adding_db=pr)
                    for kf, pr in zip(kfs, prevent_flags)]
        n = len(kfs)
        # bucket the query axis: 1 (the common local-keyframe case) or
        # multiples of 4 — padding a single query to 4 quadrupled the
        # verify upload
        Qb = 1 if n == 1 else ((n + 3) // 4) * 4
        G = int(np.asarray(kfs[0].global_desc).shape[0])
        descs = np.zeros((Qb, G), np.float32)
        metas = np.full((Qb, 4), 1, np.int32)
        metas[:, 0] = -999                   # pad rows match nothing
        metas[:, 1] = -1
        add_sel = np.zeros(Qb, np.int32)
        use_a = [False] * n
        use_b = [False] * n
        for i, (kf, pr) in enumerate(zip(kfs, prevent_flags)):
            self.num_queries += 1
            descs[i] = kf.global_desc
            metas[i] = (kf.drone_id, kf.frame_id, 1, 1)
            if kf.drone_id != self.self_id:
                # remote keyframe: match against OUR keyframes only
                use_a[i] = self._local_count > 0
                if not pr:
                    add_sel[i] = 2
            elif pr:
                # self non-keyframe: match against remote keyframes only
                use_b[i] = self._remote_count > 0
            else:
                metas[i, 2] = p.match_index_dist
                use_a[i] = self._local_count > 0
                use_b[i] = self._remote_count > 0
                add_sel[i] = 1

        # payload rings: fixed (N, Kb, P) f16, sized on first use
        Cdim = int(kfs[0].local_desc.shape[1])
        P = Cdim + 6
        if self._pay_local is None:
            Kb = max(p.max_keypoints,
                     max(int(kf.local_desc.shape[0]) for kf in kfs))
            Kb = ((Kb + 63) // 64) * 64
            shape = (p.max_db_size, Kb, P)
            self._pay_local = jnp.zeros(shape, jnp.float16)
            self._pay_remote = jnp.zeros(shape, jnp.float16)
        Kb = int(self._pay_local.shape[1])

        def pack16(o, out):
            kk = min(int(o.local_desc.shape[0]), Kb)
            out[:kk, :Cdim] = o.local_desc[:kk]
            out[:kk, Cdim] = o.valid[:kk]
            out[:kk, Cdim + 1:Cdim + 3] = o.kp_xy[:kk]
            out[:kk, Cdim + 3:Cdim + 6] = o.landmarks_3d[:kk]
            return out

        qpacks = np.zeros((Qb, Kb, P), np.float16)
        for i, kf in enumerate(kfs):
            pack16(kf, qpacks[i])

        # slots this batch overwrites: their ring payload now belongs to
        # the NEW keyframe, so a (rare: full ring) candidate pointing at
        # one must be dropped rather than verified against the wrong data
        cap = p.max_db_size
        n_ins_a = int((add_sel == 1).sum())
        n_ins_b = int((add_sel == 2).sum())
        over_a = np.zeros(cap, bool)
        over_b = np.zeros(cap, bool)
        for r in range(n_ins_a):
            if self._local_count + r >= cap:
                over_a[(self._local_count + r) % cap] = True
        for r in range(n_ins_b):
            if self._remote_count + r >= cap:
                over_b[(self._remote_count + r) % cap] = True
        use_ab = np.zeros((Qb, 2), bool)
        use_ab[:n, 0] = use_a
        use_ab[:n, 1] = use_b
        floor = min(p.netvlad_thres, p.netvlad_init_thres)

        # ---- the ENTIRE tick as one dispatch: retrieval + inserts +
        # candidate merge + geometric verify (one upload + one download
        # round over the tunnel)
        self._seed_counter += 1
        out = _tick_kernel(
            self.local_db, self.remote_db, self._pay_local,
            self._pay_remote, jnp.asarray(descs), jnp.asarray(metas),
            jnp.asarray(add_sel), jnp.asarray(qpacks),
            jnp.asarray(use_ab), jnp.float32(floor),
            jnp.asarray(over_a), jnp.asarray(over_b),
            np.uint32(self._seed0 + self._seed_counter),
            k=p.search_nearest_num, pnp_hyp=p.pnp_iterations,
            use_hom=bool(p.homography_prefilter),
            pnp_err=p.pnp_reproj_err, hom_err=p.homography_thresh_px,
            all_lanes=bool(p.balanced_db_candidates))
        (src, slot, sim_qc, idx_b, _raw, mask, n_match, n_valid,
         dpose, n_inl, inliers) = jax.device_get(out[:11])
        self.local_db, self.remote_db = out[11], out[12]
        self._pay_local, self._pay_remote = out[13], out[14]

        # commit inserts to the host slot dicts (metadata mirror)
        for i, (kf, pr) in enumerate(zip(kfs, prevent_flags)):
            if add_sel[i] == 1:
                self.local_kfs[self._local_count % p.max_db_size] = kf
                self._local_count += 1
            elif add_sel[i] == 2:
                self.remote_kfs[self._remote_count % p.max_db_size] = kf
                self._remote_count += 1

        results = [[] for _ in range(n)]
        cand_lists = []
        for i in range(n):
            cands = []
            for c in range(src.shape[1]):
                if src[i, c] < 0:
                    continue
                d = self.local_kfs if src[i, c] == 0 else self.remote_kfs
                old = d.get(int(slot[i, c]))
                if old is not None:
                    cands.append((old, float(sim_qc[i, c]), c))
            cand_lists.append(cands)
        if not any(cand_lists):
            return results
        for i, kf in enumerate(kfs):
            ka = len(kf.valid)
            accepted = []
            # walk candidates strongest-geometry-first: every candidate is
            # already verified in the fused tick, and under perceptual
            # aliasing (repetitive scenes) NetVLAD similarity mis-ranks
            # lookalike frames above true revisits while the PnP inlier
            # count ranks the true overlap highest — spend the
            # max_loops_per_query budget on the geometrically strongest
            # pairs (the reference's best-sim-first walk stops at ONE loop,
            # loop_detector.cpp:203-242, so it never faces this choice)
            order = sorted(cand_lists[i],
                           key=lambda t: -int(n_inl[i, t[2]]))
            for old, sim, c in order:
                init_mode = self._init_mode(
                    old.drone_id if kf.drone_id == self.self_id
                    else kf.drone_id)
                thres, min_inliers = self._thresholds(init_mode)
                if sim < thres:
                    # geometric override: strong PnP support overrules a
                    # weak retrieval score (already verified anyway)
                    if self.p.geometric_override_matches <= 0:
                        continue
                    min_inliers = max(min_inliers,
                                      self.p.geometric_override_matches)
                if (int(n_match[i, c]) < min_inliers
                        or int(n_valid[i, c]) < min_inliers):
                    continue
                cand = self._accept_candidate(
                    kf, old, float(sim), min_inliers, idx_b[i, c, :ka],
                    mask[i, c, :ka], dpose[i, c], int(n_inl[i, c]),
                    inliers[i, c, :ka])
                if cand is not None:
                    accepted.append(cand)
                    if len(accepted) >= p.max_loops_per_query:
                        break
            for result in accepted:
                pair = (min(result.edge.drone_a, result.edge.drone_b),
                        max(result.edge.drone_a, result.edge.drone_b))
                self.pair_loop_count[pair] = \
                    self.pair_loop_count.get(pair, 0) + 1
                self.num_loops += 1
            results[i] = accepted
        return results

    def _candidates(self, kf: KeyframeData, nonkeyframe: bool):
        """(keyframe, similarity) candidates best-first, per routing rules.

        Both databases are searched in ONE fused dispatch + one download
        (query_topk2): per-array transfers cost a full round trip each
        over the remote-TPU tunnel and dominated keyframe latency
        (measured 106-135 ms of a 618 ms r4 keyframe)."""
        k = self.p.search_nearest_num
        if kf.drone_id != self.self_id:
            # remote keyframe: match against OUR keyframes only
            use_local, use_remote = True, False
            guard_l = 1
        elif nonkeyframe:
            # self non-keyframe: match against remote keyframes only
            use_local, use_remote = False, True
            guard_l = 1
        else:
            # self keyframe: own history (recency-guarded) + remote
            use_local, use_remote = True, True
            guard_l = self.p.match_index_dist
        use_local = use_local and self._local_count > 0
        use_remote = use_remote and self._remote_count > 0
        if not (use_local or use_remote):
            return []
        meta = np.asarray(
            [kf.drone_id, kf.frame_id, guard_l, 1], np.int32)
        out_dev = placedb.query_topk2(
            self.local_db, self.remote_db,
            jnp.asarray(kf.global_desc, jnp.float32),
            jnp.asarray(meta), k=k)
        il, sl, ir, sr = jax.device_get(out_dev)
        out = []
        if use_local:
            for i, s in zip(il, sl):
                if np.isfinite(s) and int(i) in self.local_kfs:
                    out.append((self.local_kfs[int(i)], float(s)))
        if use_remote:
            for i, s in zip(ir, sr):
                if np.isfinite(s) and int(i) in self.remote_kfs:
                    out.append((self.remote_kfs[int(i)], float(s)))
        out.sort(key=lambda t: -t[1])
        return out[:k]

    def _query_and_verify(self, kf: KeyframeData,
                          nonkeyframe: bool = False) -> list:
        """Score the top-k candidates and return accepted loops.

        Batched mode (default): all candidates above the similarity floor
        are geometrically verified in ONE fixed-C fused dispatch
        (_verify_batch_kernel), then walked best-first through the
        host-side acceptance gates, keeping up to ``max_loops_per_query``.
        Walk mode (verify_batch=False): the r1-r3 behavior — one fused
        dispatch per candidate, stopping at the first verified loop
        (the reference's walk, loop_detector.cpp:203-242).
        """
        self.num_queries += 1
        cands = self._candidates(kf, nonkeyframe)
        floor = min(self.p.netvlad_thres, self.p.netvlad_init_thres)
        cands = [(old, sim) for old, sim in cands if sim >= floor]
        if not cands:
            return []

        # ONE fixed landmark capacity for query and candidates: every
        # distinct shape compiles a fresh kernel, and remote keyframes
        # reassembled from per-landmark packets arrive with ragged counts —
        # over the remote-TPU tunnel each recompile costs minutes
        Kb = max(int(old.local_desc.shape[0]) for old, _ in cands)
        Kb = max(Kb, int(kf.local_desc.shape[0]), self.p.max_keypoints)
        Kb = ((Kb + 63) // 64) * 64
        Cdim = int(cands[0][0].local_desc.shape[1])

        def pad(o):
            k = o.local_desc.shape[0]
            db = np.zeros((Kb, Cdim), np.float32)
            db[:k] = o.local_desc
            vb = np.zeros(Kb, bool)
            vb[:k] = o.valid
            kb = np.zeros((Kb, 2), np.float32)
            kb[:k] = o.kp_xy
            pb = np.zeros((Kb, 3), np.float32)
            pb[:k] = o.landmarks_3d
            return db, vb, kb, pb

        def pack(o, out):
            k = o.local_desc.shape[0]
            out[:k, :Cdim] = o.local_desc
            out[:k, Cdim] = o.valid
            out[:k, Cdim + 1:Cdim + 3] = o.kp_xy
            out[:k, Cdim + 3:Cdim + 6] = o.landmarks_3d
            return out

        kern_kw = dict(pnp_hyp=self.p.pnp_iterations,
                       use_hom=bool(self.p.homography_prefilter),
                       pnp_err=self.p.pnp_reproj_err,
                       hom_err=self.p.homography_thresh_px)

        def mode_gates(old):
            init_mode = self._init_mode(
                old.drone_id if kf.drone_id == self.self_id else kf.drone_id)
            return self._thresholds(init_mode)

        ka = len(kf.valid)               # un-pad per-landmark rows for viz
        if self.p.verify_batch:
            # fixed-C batch: pad the candidate axis to search_nearest_num
            # so the kernel compiles once per (C, Kb) bucket; all
            # candidate payloads travel as ONE packed upload
            Cb = max(self.p.search_nearest_num, len(cands))
            qpack = pack(kf, np.zeros((Kb, Cdim + 6), np.float32))
            cpack = np.zeros((Cb, Kb, Cdim + 6), np.float32)
            for i, (old, _sim) in enumerate(cands):
                pack(old, cpack[i])
            self._seed_counter = getattr(self, "_seed_counter", 0) + 1
            out = _verify_batch_kernel(
                jnp.asarray(qpack), jnp.asarray(cpack),
                np.uint32(self._seed0 + self._seed_counter), **kern_kw)
            (idx_b, _raw, mask, n_match, n_valid,
             dpose, n_inl, inliers) = jax.device_get(out)
            accepted = []
            # strongest-geometry-first walk (same rationale as the fused
            # tick path: aliasing mis-ranks similarity, inliers don't)
            order = sorted(range(len(cands)), key=lambda j: -int(n_inl[j]))
            for i in order:
                old, sim = cands[i]
                thres, min_inliers = mode_gates(old)
                if sim < thres:
                    if self.p.geometric_override_matches <= 0:
                        continue
                    min_inliers = max(min_inliers,
                                      self.p.geometric_override_matches)
                if (int(n_match[i]) < min_inliers
                        or int(n_valid[i]) < min_inliers):
                    continue
                cand = self._accept_candidate(
                    kf, old, float(sim), min_inliers, idx_b[i, :ka],
                    mask[i, :ka], dpose[i], int(n_inl[i]), inliers[i, :ka])
                if cand is not None:
                    accepted.append(cand)
                    if len(accepted) >= self.p.max_loops_per_query:
                        break
            return accepted

        qd, qv, qk, qp = (jnp.asarray(x) for x in pad(kf))
        for old, sim in cands:
            thres, min_inliers = mode_gates(old)
            if sim < thres:
                # same override contract as the batched path above:
                # sub-threshold retrieval may still verify geometrically
                # when geometric_override_matches asks for it (ADVICE r4)
                if self.p.geometric_override_matches <= 0:
                    continue
                min_inliers = max(min_inliers,
                                  self.p.geometric_override_matches)
            db, vb, kb, pb = pad(old)
            self._key, sub = jax.random.split(self._key)
            out = _verify_one_kernel(
                qd, qv, qk, qp,
                jnp.asarray(db), jnp.asarray(vb), jnp.asarray(kb),
                jnp.asarray(pb), sub, **kern_kw)
            (idx_b, raw_mask, mask, n_match, n_valid,
             dpose, n_inl, inliers) = (np.asarray(x) for x in out)
            if int(n_match) < min_inliers or int(n_valid) < min_inliers:
                continue
            cand = self._accept_candidate(
                kf, old, float(sim), min_inliers, idx_b[:ka], mask[:ka],
                dpose, int(n_inl), inliers[:ka])
            if cand is not None:
                return [cand]
        return []

    def _accept_candidate(self, kf: KeyframeData, old: KeyframeData,
                          sim: float, min_inliers: int, idx_b, mask,
                          dpose_new_in_old, n_inl: int, inliers
                          ) -> Optional[LoopCandidate]:
        """Host-side acceptance gates on one verified candidate
        (pnp_result_verify :317-335 + odometry consistency :295-315)."""
        if n_inl < min_inliers:
            return None
        dyaw = wrap(dpose_new_in_old[3])
        if self.p.accept_loop_yaw_mod > 0:
            mod = self.p.accept_loop_yaw_mod
            dyaw = dyaw - mod * np.round(dyaw / mod)
        if abs(np.degrees(dyaw)) > self.p.accept_loop_max_yaw:
            return None
        if np.linalg.norm(dpose_new_in_old[:3]) > self.p.accept_loop_max_pos:
            return None

        # loop edge: relative pose of NEW (a) as seen from OLD (b); emit as
        # a→b with dpose = a^-1 b = inverse of (new in old).
        c, s = np.cos(-dpose_new_in_old[3]), np.sin(-dpose_new_in_old[3])
        t = -np.array([
            c * dpose_new_in_old[0] - s * dpose_new_in_old[1],
            s * dpose_new_in_old[0] + c * dpose_new_in_old[1],
            dpose_new_in_old[2]])
        dpose_a_to_b = np.concatenate([t, [wrap(-dpose_new_in_old[3])]])

        if not self._odometry_consistent(kf, old, dpose_a_to_b):
            return None

        edge = LoopEdgePacket(
            drone_a=kf.drone_id, t_a=kf.t,
            drone_b=old.drone_id, t_b=old.t,
            dpose=dpose_a_to_b.astype(np.float32),
            pos_std=float(np.sqrt(self.p.loop_cov_pos)),
            yaw_std=float(np.sqrt(self.p.loop_cov_ang)))
        if self.match_viz_dir is not None:
            self._dump_match_viz(kf, old, idx_b, mask, inliers, n_inl, sim)
        return LoopCandidate(edge=edge, num_inliers=n_inl, similarity=sim)

    def _odometry_consistent(self, kf: KeyframeData, old: KeyframeData,
                             dpose_a_to_b: np.ndarray) -> bool:
        """Covariance-scaled intra-drone odometry-consistency gate.

        check_loop_odometry_consistency (loop_detector.cpp:295-315):
        squared Mahalanobis distance of (loop ⊖ VIO relative pose) under
        accumulated drift covariance (pos/yaw_covariance_per_meter x
        trajectory length) plus the loop's own covariance, gated at
        odometry_consistency_threshold. Inter-drone loops skip the check.
        """
        if kf.drone_id != old.drone_id:
            return True
        p = self.p
        odo = delta_pose_np(np.asarray(kf.pose), np.asarray(old.pose))
        dp = odo - dpose_a_to_b
        dp[3] = wrap(dp[3])
        length = max(float(np.linalg.norm(odo[:3])), 0.1)
        cov_pos = p.pos_covariance_per_meter * length + p.loop_cov_pos
        cov_yaw = p.yaw_covariance_per_meter * length + p.loop_cov_ang
        md = float(np.sum(dp[:3] ** 2) / cov_pos + dp[3] ** 2 / cov_yaw)
        # normalize per DoF (our residual is 4-DoF; the reference thresholds
        # a 6-DoF squared Mahalanobis at 2.0)
        return md / 4.0 <= p.odometry_consistency_threshold

    def _dump_match_viz(self, kf: KeyframeData, old: KeyframeData,
                        idx_b: np.ndarray, match_mask: np.ndarray,
                        inliers: np.ndarray, n_inl: int, sim: float) -> None:
        """Write the accepted loop's match PNG if both images were registered."""
        import os

        img_a = self._images.get((int(kf.drone_id), int(kf.frame_id)))
        img_b = self._images.get((int(old.drone_id), int(old.frame_id)))
        if img_a is None or img_b is None:
            return
        from omniswarm_tpu.eval.match_viz import save_match_image

        name = (f"loop_d{kf.drone_id}f{kf.frame_id}"
                f"_d{old.drone_id}f{old.frame_id}.png")
        save_match_image(
            img_a, np.asarray(kf.kp_xy), img_b, np.asarray(old.kp_xy),
            idx_b, match_mask, inliers,
            os.path.join(self.match_viz_dir, name),
            title=(f"d{kf.drone_id}f{kf.frame_id} ← d{old.drone_id}"
                   f"f{old.frame_id}  sim={sim:.2f}  inl={n_inl}"))
