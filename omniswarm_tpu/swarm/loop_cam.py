"""Keyframe descriptor builder — the LoopCam equivalent.

Re-design of /root/reference/swarm_loop/src/loop_cam.cpp: turn a (stereo or
depth) camera frame + VIO pose into a shareable KeyframeData:

1. SuperPoint keypoints + PCA local descriptors and NetVLAD global
   descriptor on the left/gray image (extractor_img_desc_deepnet :525-634),
2. left↔right descriptor matching (match_HFNet_local_features :141-174 —
   here the matmul mutual matcher) and batched ray triangulation for 3-D
   landmarks (triangulatePoint :73-106), or depth-image back-projection for
   RGB-D (generate_gray_depth_image_descriptor :231-339),
3. assembly into the fixed-capacity KeyframeData consumed by LoopNet /
   LoopDetector.

Both CNN extractors are injectable so the pipeline is testable with
synthetic features; the default wiring uses the Flax models. Camera model:
normalized pinhole (fx, fy, cx, cy) — bearings are unit rays in the
gravity-aligned body frame.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.config import FrontendParams
from omniswarm_tpu.ops.matching import mutual_match
from omniswarm_tpu.ops.triangulation import triangulate_stereo
from omniswarm_tpu.swarm.comm import KeyframeData


@dataclass
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float

    def bearings(self, xy: np.ndarray) -> np.ndarray:
        """Pixel coords (K, 2) → unit rays (K, 3) in camera frame
        (x right, y down, z forward)."""
        x = (xy[:, 0] - self.cx) / self.fx
        y = (xy[:, 1] - self.cy) / self.fy
        rays = np.stack([x, y, np.ones_like(x)], axis=1)
        return rays / np.linalg.norm(rays, axis=1, keepdims=True)


# camera (x right, y down, z fwd) → body (x fwd, y left, z up)
CAM_TO_BODY = np.array([[0.0, 0.0, 1.0],
                        [-1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0]])


class LoopCam:
    def __init__(self, *, params: Optional[FrontendParams] = None,
                 intrinsics: Optional[CameraIntrinsics] = None,
                 baseline: float = 0.12,
                 keypoint_extractor=None, global_extractor=None):
        self.p = params or FrontendParams()
        self.intr = intrinsics or CameraIntrinsics(
            fx=0.5 * self.p.width, fy=0.5 * self.p.width,
            cx=self.p.width / 2, cy=self.p.height / 2)
        self.baseline = baseline
        self._kp = keypoint_extractor
        self._gd = global_extractor

    def _ensure_models(self):
        if self._kp is None:
            from omniswarm_tpu.models.superpoint import SuperPointExtractor

            self._kp = SuperPointExtractor(
                height=self.p.height, width=self.p.width,
                max_keypoints=self.p.max_keypoints,
                threshold=self.p.superpoint_thres,
                nms_dist=self.p.nms_dist, pca_dim=self.p.local_desc_dim)
        if self._gd is None:
            from omniswarm_tpu.models.netvlad import GlobalDescriptorExtractor

            self._gd = GlobalDescriptorExtractor(
                height=self.p.height, width=self.p.width,
                out_dim=self.p.global_desc_dim)

    def on_stereo_frame(self, drone_id: int, frame_id: int, t: float,
                        vio_pose: np.ndarray, left: np.ndarray,
                        right: np.ndarray) -> KeyframeData:
        """Stereo keyframe: triangulate matched L/R features.

        left/right: (H, W) grayscale in [0, 1].
        """
        self._ensure_models()
        imgs = jnp.asarray(
            np.stack([left, right])[..., None], jnp.float32)
        xy, scores, desc, valid = self._kp(imgs)
        gdesc = np.asarray(self._gd(imgs[:1]))[0]

        m = mutual_match(desc[0], desc[1], valid[0], valid[1],
                         min_similarity=0.5)
        mask = np.asarray(m.mask)
        idx_r = np.asarray(m.idx_b)
        xy_l = np.asarray(xy[0], np.float32)
        xy_r = np.asarray(xy[1], np.float32)[idx_r]

        rays_l = self.intr.bearings(xy_l)
        rays_r = self.intr.bearings(xy_r)
        pts_cam, err = triangulate_stereo(
            jnp.asarray(rays_l), jnp.asarray(rays_r), self.baseline)
        pts_cam = np.asarray(pts_cam)
        err = np.asarray(err)
        depth = pts_cam[:, 2]
        ok = (mask & (err < self.p.triangulate_max_err)
              & (depth > 0.3) & (depth < 30.0))
        pts_body = pts_cam @ CAM_TO_BODY.T

        return KeyframeData(
            drone_id=drone_id, frame_id=frame_id, t=t,
            pose=np.asarray(vio_pose, np.float32),
            global_desc=gdesc.astype(np.float32),
            kp_xy=xy_l,
            landmarks_3d=np.where(ok[:, None], pts_body, 0.0).astype(
                np.float32),
            local_desc=np.asarray(desc[0], np.float32),
            valid=ok)

    def on_depth_frame(self, drone_id: int, frame_id: int, t: float,
                       vio_pose: np.ndarray, gray: np.ndarray,
                       depth: np.ndarray) -> KeyframeData:
        """RGB-D keyframe: back-project keypoints through the depth map
        (reference PINHOLE_DEPTH path, loop_cam.cpp:231-339)."""
        self._ensure_models()
        img = jnp.asarray(gray[None, ..., None], jnp.float32)
        xy, scores, desc, valid = self._kp(img)
        gdesc = np.asarray(self._gd(img))[0]
        xy0 = np.asarray(xy[0])
        xi = np.clip(np.round(xy0[:, 0]).astype(int), 0, depth.shape[1] - 1)
        yi = np.clip(np.round(xy0[:, 1]).astype(int), 0, depth.shape[0] - 1)
        z = depth[yi, xi]
        rays = self.intr.bearings(xy0.astype(np.float32))
        pts_cam = rays * (z / np.maximum(rays[:, 2], 1e-6))[:, None]
        ok = np.asarray(valid[0]) & (z > 0.3) & (z < 10.0)
        pts_body = pts_cam @ CAM_TO_BODY.T
        return KeyframeData(
            drone_id=drone_id, frame_id=frame_id, t=t,
            pose=np.asarray(vio_pose, np.float32),
            global_desc=gdesc.astype(np.float32),
            kp_xy=xy0.astype(np.float32),
            landmarks_3d=np.where(ok[:, None], pts_body, 0.0).astype(
                np.float32),
            local_desc=np.asarray(desc[0], np.float32),
            valid=ok)
