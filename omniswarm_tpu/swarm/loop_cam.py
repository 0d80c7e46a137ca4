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
anything exposing ``bearings(xy) -> unit rays`` — the simple pinhole below,
or any ops.camera model (PinholeCamera/MeiCamera/EquidistantCamera, the
camodocal equivalents) wrapped in ops.camera.CameraBearings.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

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
        # default wiring prefers the bundled synthetic-trained checkpoints
        # (tools/train_superpoint_tool.py, tools/train_netvlad_tool.py);
        # random init is the fallback when a weights file is absent.
        if self._kp is None:
            from omniswarm_tpu.models.superpoint import (
                SuperPointExtractor, pretrained_extractor)

            kw = dict(height=self.p.height, width=self.p.width,
                      max_keypoints=self.p.max_keypoints,
                      threshold=self.p.superpoint_thres,
                      nms_dist=self.p.nms_dist, pca_dim=self.p.local_desc_dim)
            try:
                self._kp = pretrained_extractor(**kw)
            except (FileNotFoundError, OSError):
                self._kp = SuperPointExtractor(**kw)
        if self._gd is None:
            from omniswarm_tpu.models.netvlad import (
                GlobalDescriptorExtractor, pretrained_global_extractor)

            try:
                # bundled checkpoint is use_proj=False with K*C = 4096
                if self.p.global_desc_dim != 4096:
                    raise FileNotFoundError
                self._gd = pretrained_global_extractor(
                    height=self.p.height, width=self.p.width)
            except (FileNotFoundError, OSError):
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
        ok = (mask & np.isfinite(pts_cam).all(axis=1)
              & (err < self.p.triangulate_max_err)
              & (depth > 0.3) & (depth < 30.0))
        pts_body = np.nan_to_num(pts_cam) @ CAM_TO_BODY.T

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


def yaw_rotate_np(yaw: float, pts: np.ndarray) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    out = pts.copy()
    out[:, 0] = c * pts[:, 0] - s * pts[:, 1]
    out[:, 1] = s * pts[:, 0] + c * pts[:, 1]
    return out


class OmniLoopCam(LoopCam):
    """Omnidirectional (multi-direction fisheye) keyframe builder.

    The reference assembles a FisheyeFrameDescriptor_t over up to 4 flattened
    fisheye directions, each with its own SuperPoint/NetVLAD pass
    (loop_cam.cpp:178-229), and later rotates correspondences between
    directions during loop matching (loop_detector.cpp:431-537). Because our
    loop pipeline operates on *body-frame bearings* (ops/ransac works on unit
    rays, not pixels), the per-direction bookkeeping collapses: each
    direction's landmarks are rotated into the body frame at build time and
    merged into ONE KeyframeData — direction-aligned correspondence
    gathering becomes unnecessary by construction.

    ``view_yaws`` are each virtual pinhole direction's yaw relative to the
    body x-axis (default: front/left/back/right).
    """

    VIEW_YAWS = (0.0, np.pi / 2, np.pi, -np.pi / 2)

    def on_fisheye_frame(self, drone_id: int, frame_id: int, t: float,
                         vio_pose: np.ndarray,
                         stereo_pairs, view_yaws=None) -> KeyframeData:
        """stereo_pairs: sequence of (left, right) grayscale view pairs
        (up to 4 directions; None entries skipped)."""
        view_yaws = self.VIEW_YAWS if view_yaws is None else view_yaws
        parts = []
        gdescs = []
        for v, pair in enumerate(stereo_pairs):
            if pair is None:
                continue
            left, right = pair
            kf_v = self.on_stereo_frame(drone_id, frame_id, t, vio_pose,
                                        left, right)
            lm = yaw_rotate_np(view_yaws[v], kf_v.landmarks_3d)
            parts.append((kf_v.kp_xy, lm, kf_v.local_desc, kf_v.valid))
            gdescs.append(kf_v.global_desc)

        if not parts:
            raise ValueError("no valid fisheye views")
        kp_xy = np.concatenate([p[0] for p in parts], 0)
        lms = np.concatenate([p[1] for p in parts], 0)
        descs = np.concatenate([p[2] for p in parts], 0)
        valid = np.concatenate([p[3] for p in parts], 0)
        gd = np.mean(gdescs, axis=0)
        gd = gd / max(np.linalg.norm(gd), 1e-8)
        return KeyframeData(
            drone_id=drone_id, frame_id=frame_id, t=t,
            pose=np.asarray(vio_pose, np.float32),
            global_desc=gd.astype(np.float32), kp_xy=kp_xy,
            landmarks_3d=lms.astype(np.float32), local_desc=descs,
            valid=valid)
