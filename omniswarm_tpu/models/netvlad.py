"""MobileNetVLAD global image descriptor as a Flax module.

TPU-native counterpart of the reference's NetVLAD TensorRT engine
(/root/reference/swarm_loop/src/mobilenetvlad_tensorrt.cpp, 4096-d output —
DEEP_DESC_SIZE, loop_defines.h:30): a MobileNet-style depthwise-separable
encoder followed by a NetVLAD pooling layer (soft cluster assignment +
intra-normalized residual aggregation) and a linear dimensionality-reduction
to 4096, L2-normalized so loop candidates are retrieved by inner product
(the reference queries faiss IndexFlatIP, loop_detector.cpp:176-242).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class SeparableConv(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=in_ch,
                    dtype=self.dtype, name="dw")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="pw")(x)
        return nn.relu(x)


class MobileNetEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name="stem")(x))
        for i, (c, s) in enumerate(
                [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2)]):
            x = SeparableConv(c, s, dtype=self.dtype, name=f"sep{i}")(x)
        return x  # (B, H/16, W/16, 512)


class SeparableConvGN(nn.Module):
    """v2 block: depthwise/pointwise convs with GroupNorm (f32) + ReLU."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=in_ch,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        x = nn.GroupNorm(num_groups=min(32, in_ch), dtype=jnp.float32,
                         name="dw_gn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pw")(x)
        x = nn.GroupNorm(num_groups=min(32, self.features),
                         dtype=jnp.float32, name="pw_gn")(x)
        return nn.relu(x).astype(self.dtype)


class MobileNetEncoderV2(nn.Module):
    """Normalized, one-block-deeper encoder (checkpoint arch version 2).

    The v1 encoder has no normalization anywhere — fine for the shallow
    detector-style training it was born in, but it caps contrastive
    place-recognition training well below the revisit-benchmark target.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         name="stem_gn")(x)
        x = nn.relu(x).astype(self.dtype)
        for i, (c, s) in enumerate(
                [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                 (512, 2), (512, 1)]):
            x = SeparableConvGN(c, s, dtype=self.dtype, name=f"sep{i}")(x)
        return x  # (B, H/16, W/16, 512)


class NetVLAD(nn.Module):
    """NetVLAD pooling: (B, H, W, C) → (B, K*C) → projected descriptor.

    With ``use_proj=False`` the raw intra-normalized VLAD vector (K*C dims,
    which callers should pick equal to out_dim) is returned directly — this
    keeps the bundled checkpoint small (the 4096→4096 projection of a
    64-cluster VLAD would be 134M parameters).
    """

    num_clusters: int = 64
    out_dim: int = 4096
    use_proj: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        feats = x.reshape(B, H * W, C).astype(jnp.float32)
        # soft assignment (1x1 conv ≡ dense over channels)
        logits = nn.Dense(self.num_clusters, name="assign")(feats)
        assign = jax.nn.softmax(logits, axis=-1)          # (B, N, K)
        centroids = self.param(
            "centroids", nn.initializers.normal(0.1),
            (self.num_clusters, C))
        # residual aggregation: sum_n a_nk (f_n - c_k)
        agg = jnp.einsum("bnk,bnc->bkc", assign, feats)
        mass = jnp.sum(assign, axis=1)                    # (B, K)
        vlad = agg - mass[..., None] * centroids[None]
        # intra-normalization then global L2
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-8)
        vlad = vlad.reshape(B, -1)
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-8)
        if not self.use_proj:
            return vlad
        out = nn.Dense(self.out_dim, use_bias=False, name="proj")(vlad)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)


class MobileNetVLAD(nn.Module):
    num_clusters: int = 64
    out_dim: int = 4096
    use_proj: bool = True
    dtype: Any = jnp.float32
    encoder_version: int = 1

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 1) grayscale in [0,1] → (B, out_dim) unit desc."""
        enc = (MobileNetEncoderV2 if self.encoder_version >= 2
               else MobileNetEncoder)
        x = enc(dtype=self.dtype, name="encoder")(images)
        return NetVLAD(self.num_clusters, self.out_dim, self.use_proj,
                       name="vlad")(x)


class GlobalDescriptorExtractor:
    def __init__(self, params: Optional[Dict] = None, *, height: int = 208,
                 width: int = 400, num_clusters: int = 64,
                 out_dim: int = 4096, use_proj: bool = True,
                 dtype: Any = jnp.float32, seed: int = 0,
                 encoder_version: int = 1):
        self.model = MobileNetVLAD(num_clusters=num_clusters,
                                   out_dim=out_dim, use_proj=use_proj,
                                   dtype=dtype,
                                   encoder_version=encoder_version)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, height, width, 1), jnp.float32))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.params, images)


# v2 GroupNorm encoder trained with the revisit curriculum (24k steps,
# rot +/-0.5 rad, 0.8-1.25x zoom, noise 0.06): easy 64-way recall@1 0.750,
# hard 256-way revisit recall@1 0.742 — NETVLAD_EVAL.json. The r2 v1
# checkpoint remains at weights/netvlad_synthetic.npz.
DEFAULT_WEIGHTS = "weights/netvlad_v2_revisit.npz"

# bundled checkpoint architecture: K*C = 8*512 = 4096 = out_dim, no proj
BUNDLED_CLUSTERS = 8
BUNDLED_OUT_DIM = 4096


def save_netvlad_npz(params: Dict, path: str, *,
                     encoder_version: int = 1) -> None:
    """Save MobileNetVLAD params as a flat float16 npz (+arch metadata)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    out = {k: np.asarray(v, np.float16) for k, v in flat.items()}
    out["__encoder_version"] = np.asarray(encoder_version, np.int32)
    np.savez_compressed(path, **out)


def load_netvlad_npz(path: str) -> Dict:
    """Load MobileNetVLAD params saved by save_netvlad_npz."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    raw = np.load(path)
    return unflatten_dict(
        {k: jnp.asarray(raw[k], jnp.float32) for k in raw.files
         if not k.startswith("__")}, sep="/")


def netvlad_meta(path: str) -> Dict:
    """Checkpoint arch metadata (encoder_version; v1 if absent)."""
    import numpy as np

    raw = np.load(path)
    ver = int(raw["__encoder_version"]) if "__encoder_version" in raw.files \
        else 1
    return {"encoder_version": ver}


def pretrained_global_extractor(**kw) -> "GlobalDescriptorExtractor":
    """GlobalDescriptorExtractor with the bundled synthetic-trained weights.

    Trained by tools/train_netvlad_tool.py with an in-batch contrastive
    (NT-Xent) objective on synthetic places under viewpoint/illumination
    jitter — the zero-egress stand-in for the reference's pretrained
    MobileNetVLAD TensorRT engine (mobilenetvlad_tensorrt.cpp, 4096-d).
    """
    import os

    path = os.path.join(os.path.dirname(__file__), DEFAULT_WEIGHTS)
    params = load_netvlad_npz(path)
    kw.setdefault("num_clusters", BUNDLED_CLUSTERS)
    kw.setdefault("out_dim", BUNDLED_OUT_DIM)
    kw.setdefault("use_proj", False)
    kw.setdefault("encoder_version", netvlad_meta(path)["encoder_version"])
    return GlobalDescriptorExtractor(params, **kw)
