"""SuperPoint keypoint detector + descriptor as a Flax module.

TPU-native re-implementation of the network the reference runs through
TensorRT (/root/reference/swarm_loop/src/superpoint_tensorrt.cpp and the
architecture exported in swarm_loop/superpoint.ipynb): VGG-style shared
encoder (64,64 /2 64,64 /2 128,128 /2 128,128), a 65-channel detector head
(8x8 cells + dustbin), and a 256-d descriptor head.

Differences from the reference pipeline (by design, not omission):
- NHWC layout and fused XLA convs instead of TRT engines;
- post-processing (softmax → depth-to-space heat map → NMS → top-K →
  bilinear descriptor sampling → PCA 256→64) is fixed-shape and fully
  batched/jittable (see ``extract`` and ops/keypoints.py), replacing the
  OpenCV findNonZero/NMS2 host code (superpoint_tensorrt.cpp:164-309).
- weights load from a numpy .npz checkpoint (converted from the reference's
  pth/ONNX by tools/convert_superpoint.py) or initialize randomly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from omniswarm_tpu.ops.keypoints import (
    bilinear_sample_descriptors,
    extract_keypoints,
)


class SuperPoint(nn.Module):
    """Returns (heatmap (B, H, W), desc_coarse (B, H/8, W/8, 256))."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 return_logits: bool = False):
        """images: (B, H, W, 1) grayscale in [0, 1].

        Returns (heat, desc) or, with return_logits, (heat, desc, semi)
        where semi is the raw 65-channel detector logit map (training)."""
        x = images.astype(self.dtype)
        conv = lambda c, k, name: nn.Conv(c, (k, k), padding="SAME",
                                          dtype=self.dtype, name=name)
        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(conv(64, 3, "conv1a")(x))
        x = nn.relu(conv(64, 3, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(64, 3, "conv2a")(x))
        x = nn.relu(conv(64, 3, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv3a")(x))
        x = nn.relu(conv(128, 3, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv4a")(x))
        x = nn.relu(conv(128, 3, "conv4b")(x))

        # Detector head: 65 = 8x8 cell pixels + dustbin.
        cpa = nn.relu(conv(256, 3, "convPa")(x))
        logits = conv(65, 1, "convPb")(cpa).astype(jnp.float32)
        semi = jax.nn.softmax(logits, axis=-1)[..., :64]   # (B, Hc, Wc, 64)
        B, Hc, Wc, _ = semi.shape
        # depth-to-space: (B, Hc, Wc, 8*8) → (B, Hc*8, Wc*8)
        heat = semi.reshape(B, Hc, Wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        # Descriptor head.
        cda = nn.relu(conv(256, 3, "convDa")(x))
        desc = conv(256, 1, "convDb")(cda).astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        if return_logits:
            return heat, desc, logits
        return heat, desc


class SuperPointExtractor:
    """SuperPoint + fixed-shape post-processing + PCA projection.

    The full keyframe local-feature path: returns up to ``max_keypoints``
    (x, y) pixel coords, confidences, and ``pca_dim``-d descriptors with a
    validity mask — ready for the matmul matcher.
    """

    def __init__(self, params: Optional[Dict] = None, *,
                 height: int = 208, width: int = 400,
                 max_keypoints: int = 200, threshold: float = 0.012,
                 nms_dist: int = 4, pca_dim: int = 64,
                 dtype: Any = jnp.float32, seed: int = 0):
        self.model = SuperPoint(dtype=dtype)
        self.height, self.width = height, width
        self.max_keypoints = max_keypoints
        self.threshold = threshold
        self.nms_dist = nms_dist
        self.pca_dim = pca_dim
        if params is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, height, width, 1), jnp.float32)
            params = {"net": self.model.init(key, dummy)}
            k2 = jax.random.fold_in(key, 1)
            comps = jax.random.normal(k2, (pca_dim, 256)) / 16.0
            params["pca_components"] = comps
            params["pca_mean"] = jnp.zeros((256,))
        self.params = params
        self._extract = jax.jit(self._extract_impl)

    def _extract_impl(self, params, images):
        heat, desc_coarse = self.model.apply(params["net"], images)
        xy, scores, valid = jax.vmap(
            lambda h: extract_keypoints(
                h, max_keypoints=self.max_keypoints,
                threshold=self.threshold, nms_dist=self.nms_dist)
        )(heat)
        desc = jax.vmap(
            lambda dc, p: bilinear_sample_descriptors(dc, p, cell=8)
        )(desc_coarse, xy.astype(jnp.float32))
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        # PCA 256→64 (reference: USE_PCA, superpoint_tensorrt.cpp:192-230)
        desc = (desc - params["pca_mean"]) @ params["pca_components"].T
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return xy, scores, desc, valid

    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 1) → (xy (B,K,2) i32, scores (B,K),
        desc (B,K,pca_dim), valid (B,K) bool)."""
        return self._extract(self.params, images)


def load_params_npz(path: str) -> Dict:
    """Load SuperPoint weights from a converted .npz checkpoint."""
    import numpy as np

    raw = np.load(path)
    net: Dict[str, Dict] = {"params": {}}
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    for n in names:
        # torch OIHW → flax HWIO
        w = raw[f"{n}.weight"].transpose(2, 3, 1, 0)
        net["params"][n] = {"kernel": jnp.asarray(w),
                            "bias": jnp.asarray(raw[f"{n}.bias"])}
    params = {"net": net}
    if "pca_components" in raw:
        params["pca_components"] = jnp.asarray(raw["pca_components"])
        params["pca_mean"] = jnp.asarray(raw["pca_mean"])
    return params


def save_flax_npz(params: Dict, path: str) -> None:
    """Save a flax params pytree as a flat npz (float16 to halve size)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params["net"] if "net" in params else params,
                        sep="/")
    out = {k: np.asarray(v, np.float16) for k, v in flat.items()}
    for extra in ("pca_components", "pca_mean"):
        if extra in params:
            out[f"__{extra}"] = np.asarray(params[extra], np.float16)
    np.savez_compressed(path, **out)


def load_flax_npz(path: str) -> Dict:
    """Load a flax params pytree saved by save_flax_npz."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    raw = np.load(path)
    flat = {}
    params: Dict = {}
    for k in raw.files:
        if k.startswith("__"):
            params[k[2:]] = jnp.asarray(raw[k], jnp.float32)
        else:
            flat[k] = jnp.asarray(raw[k], jnp.float32)
    params["net"] = unflatten_dict(flat, sep="/")
    return params


DEFAULT_WEIGHTS = "weights/superpoint_photo_v2.npz"


def pretrained_extractor(**kw) -> "SuperPointExtractor":
    """SuperPointExtractor with the bundled TPU-trained checkpoint.

    Default is the round-5 photometric curriculum checkpoint
    (tools/train_superpoint_tool.py --stage photometric: textured-surface
    detector via homographic adaptation + joint descriptor training on
    eval-matched warps + fitted 256→64 PCA; SP_EVAL_r05.json pins 0.88
    match precision at 359 matches on textured imagery vs the MagicPoint
    stage's 0.97 at 148). Swap in converted original weights via
    load_params_npz for photographic imagery.
    """
    import os

    path = os.path.join(os.path.dirname(__file__), DEFAULT_WEIGHTS)
    params = load_flax_npz(path)
    if "pca_components" not in params:
        key = jax.random.PRNGKey(0)
        pca_dim = kw.get("pca_dim", 64)
        params["pca_components"] = jax.random.normal(
            key, (pca_dim, 256)) / 16.0
        params["pca_mean"] = jnp.zeros((256,))
    return SuperPointExtractor(params=params, **kw)
