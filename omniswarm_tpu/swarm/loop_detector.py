"""Loop recognition + geometric verification pipeline.

The TPU-native re-design of the reference's LoopDetector
(/root/reference/swarm_loop/src/loop_detector.cpp): on every keyframe
(local or received from a peer over LoopNet),

1. query the place-recognition database by global-descriptor inner product
   with per-mode thresholds and the recency guard
   (query_fisheyeframe_from_database :176-242; faiss → ops/placedb matmul);
2. mutual-NN match local descriptors against the hit keyframe
   (compute_correspond_features :431-537 → ops/matching matmul);
3. solve the 4-DoF relative pose by vmapped PnP RANSAC on (3-D new ↔
   bearing old) correspondences (compute_relative_pose :355-413 →
   ops/ransac linear hypotheses);
4. verify: inlier count, relative-pose magnitude/yaw gates, and intra-drone
   odometry consistency (pnp_result_verify :317-335,
   check_loop_odometry_consistency :295-315);
5. init-mode: relaxed thresholds until ``inter_drone_init_frames`` loops
   have been found for a drone pair (:66-72);
6. add the keyframe to the database.

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
from omniswarm_tpu.ops.matching import mutual_match
from omniswarm_tpu.ops.ransac import pnp_ransac_4dof
from omniswarm_tpu.sim.simulator import delta_pose_np, wrap
from omniswarm_tpu.swarm.comm import KeyframeData, LoopEdgePacket


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
        self.db = placedb.make_placedb(self.p.max_db_size, global_dim)
        self.keyframes: Dict[int, KeyframeData] = {}    # db slot -> keyframe
        self.pair_loop_count: Dict[Tuple[int, int], int] = {}
        self._key = jax.random.PRNGKey(seed)
        self.num_queries = 0
        self.num_loops = 0
        # opt-in loop-match PNG dumps (loop_detector.cpp:695-785 DEBUG_IMAGE)
        self.match_viz_dir = match_viz_dir
        self._images: Dict[Tuple[int, int], np.ndarray] = {}

    def register_image(self, drone_id: int, frame_id: int,
                       image: np.ndarray) -> None:
        """Keep a keyframe's image for match visualization (opt-in).

        Only consulted when ``match_viz_dir`` is set; bounded by the place
        database capacity."""
        if self.match_viz_dir is None:
            return
        if len(self._images) >= self.p.max_db_size:
            self._images.pop(next(iter(self._images)))
        self._images[(int(drone_id), int(frame_id))] = np.asarray(image)

    # ------------------------------------------------------------------
    def _thresholds(self, drone_a: int, drone_b: int) -> Tuple[float, int]:
        """(similarity threshold, min inliers) with init-mode relaxation."""
        pair = (min(drone_a, drone_b), max(drone_a, drone_b))
        inter = drone_a != drone_b
        count = self.pair_loop_count.get(pair, 0)
        if inter and count < self.p.inter_drone_init_frames:
            # init mode: relaxed gates until the pair is initialized
            return self.p.netvlad_thres * 0.8, max(
                int(self.p.min_loop_matches * 0.7), 8)
        return self.p.netvlad_thres, self.p.min_loop_matches

    def on_keyframe(self, kf: KeyframeData,
                    ego_pose_old: Optional[np.ndarray] = None
                    ) -> Optional[LoopCandidate]:
        """Process one keyframe: query → verify → add to DB.

        Returns a verified loop candidate or None. ``ego_pose_old`` supplies
        the current drone's pose estimate for the odometry-consistency gate.
        """
        result = self._query_and_verify(kf)
        # add AFTER query so a frame never matches itself
        slot = int(self.db.cursor) % self.p.max_db_size
        self.db = placedb.add(
            self.db, jnp.asarray(kf.global_desc, jnp.float32),
            jnp.asarray(kf.drone_id), jnp.asarray(kf.frame_id))
        self.keyframes[slot] = kf
        if result is not None:
            pair = (min(result.edge.drone_a, result.edge.drone_b),
                    max(result.edge.drone_a, result.edge.drone_b))
            self.pair_loop_count[pair] = self.pair_loop_count.get(pair, 0) + 1
            self.num_loops += 1
        return result

    def _query_and_verify(self, kf: KeyframeData) -> Optional[LoopCandidate]:
        self.num_queries += 1
        if int(self.db.cursor) == 0:
            return None
        idx, sim = placedb.query(
            self.db, jnp.asarray(kf.global_desc, jnp.float32),
            jnp.asarray(kf.drone_id), jnp.asarray(kf.frame_id),
            match_index_dist=self.p.match_index_dist)
        idx, sim = int(idx), float(sim)
        if not np.isfinite(sim) or idx not in self.keyframes:
            return None
        old = self.keyframes[idx]
        thres, min_inliers = self._thresholds(kf.drone_id, old.drone_id)
        if sim < thres:
            return None

        # local feature matching: new (a) descriptors vs old (b)
        m = mutual_match(
            jnp.asarray(kf.local_desc, jnp.float32),
            jnp.asarray(old.local_desc, jnp.float32),
            jnp.asarray(kf.valid), jnp.asarray(old.valid),
            min_similarity=0.5)
        mask = np.asarray(m.mask)
        if mask.sum() < min_inliers:
            return None
        idx_b = np.asarray(m.idx_b)

        # PnP: new keyframe's 3-D landmarks (its body frame) vs old
        # keyframe's bearing observations of the matched landmarks.
        K = kf.landmarks_3d.shape[0]
        pts = np.asarray(kf.landmarks_3d, np.float32)
        old_p3d = np.asarray(old.landmarks_3d, np.float32)[idx_b % max(
            old.landmarks_3d.shape[0], 1)]
        norms = np.linalg.norm(old_p3d, axis=1, keepdims=True)
        bearings = old_p3d / np.maximum(norms, 1e-6)
        valid = mask & (norms[:, 0] > 1e-3) & (
            np.linalg.norm(pts, axis=1) > 1e-3)
        if valid.sum() < min_inliers:
            return None

        self._key, sub = jax.random.split(self._key)
        res = pnp_ransac_4dof(
            jnp.asarray(pts), jnp.asarray(bearings), jnp.asarray(valid),
            sub, err_thresh=self.p.pnp_reproj_err,
            num_hypotheses=self.p.pnp_iterations)
        n_inl = int(res.num_inliers)
        dpose_new_in_old = np.asarray(res.dpose)   # new frame in old frame

        # verification gates (pnp_result_verify):
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

        # intra-drone odometry-consistency gate
        if kf.drone_id == old.drone_id:
            odo = delta_pose_np(np.asarray(kf.pose), np.asarray(old.pose))
            diff = odo - dpose_a_to_b
            if (np.linalg.norm(diff[:3]) >
                    max(1.0, 0.1 * np.linalg.norm(odo[:3]) * 5)):
                return None

        edge = LoopEdgePacket(
            drone_a=kf.drone_id, t_a=kf.t,
            drone_b=old.drone_id, t_b=old.t,
            dpose=dpose_a_to_b.astype(np.float32),
            pos_std=float(np.sqrt(self.p.loop_cov_pos)),
            yaw_std=float(np.sqrt(self.p.loop_cov_ang)))
        if self.match_viz_dir is not None:
            self._dump_match_viz(kf, old, idx_b, valid,
                                 np.asarray(res.inliers), n_inl, sim)
        return LoopCandidate(edge=edge, num_inliers=n_inl, similarity=sim)

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
