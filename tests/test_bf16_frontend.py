"""bf16 front-end trunk vs f32: numerical parity of the CNN outputs.

On TPU the conv trunks should run in bfloat16 (MXU-native); the heads
(detector softmax, descriptor normalization, VLAD pooling) stay f32 by
construction (models/superpoint.py casts logits/desc to f32,
models/netvlad.py pools in f32). These tests pin that the bf16 trunk
preserves what the pipeline consumes: heat-map values, descriptor
direction, and global-descriptor retrieval ranking.
"""
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.models.netvlad import pretrained_global_extractor
from omniswarm_tpu.models.superpoint import pretrained_extractor
from omniswarm_tpu.models.train_superpoint import render_shapes


def _images(n=2, h=96, w=160, seed=0):
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, h, w, 1), np.float32)
    for i in range(n):
        img, _ = render_shapes(rng, h, w, n_shapes=8)
        imgs[i, :, :, 0] = img
    return jnp.asarray(imgs)


def test_superpoint_bf16_trunk_matches_f32():
    imgs = _images()
    ex32 = pretrained_extractor(height=96, width=160, max_keypoints=64)
    ex16 = pretrained_extractor(height=96, width=160, max_keypoints=64,
                                dtype=jnp.bfloat16)

    heat32, desc32 = ex32.model.apply(ex32.params["net"], imgs)
    heat16, desc16 = ex16.model.apply(ex16.params["net"], imgs)
    assert heat32.dtype == heat16.dtype == jnp.float32
    # heat maps: small absolute perturbation (values in [0, 1])
    assert float(jnp.max(jnp.abs(heat32 - heat16))) < 0.03
    # coarse descriptors: direction preserved everywhere
    cos = jnp.sum(desc32 * desc16, axis=-1)
    assert float(jnp.min(cos)) > 0.995

    # end-to-end extract: the bf16 keypoint set reproduces the f32 one
    # (sub-pixel refined coords — match by distance, not exact equality)
    xy32, s32, d32, v32 = ex32(imgs)
    xy16, s16, d16, v16 = ex16(imgs)
    for b in range(imgs.shape[0]):
        a = np.asarray(xy32[b])[np.asarray(v32[b])]
        c = np.asarray(xy16[b])[np.asarray(v16[b])]
        if len(a) == 0 or len(c) == 0:
            # bf16 must not silently drop every keypoint f32 found
            assert len(a) == len(c) == 0, (b, len(a), len(c))
            continue
        d = np.linalg.norm(a[:, None] - c[None], axis=-1)
        matched = (d.min(axis=1) < 1.0).mean()
        assert matched > 0.9, (b, matched)


def test_netvlad_bf16_trunk_preserves_retrieval():
    imgs = _images(n=6, seed=1)
    nv32 = pretrained_global_extractor(height=96, width=160)
    nv16 = pretrained_global_extractor(height=96, width=160,
                                       dtype=jnp.bfloat16)
    d32 = np.asarray(nv32(imgs))
    d16 = np.asarray(nv16(imgs))
    # descriptor direction preserved
    cos = np.sum(d32 * d16, axis=-1)
    assert cos.min() > 0.99, cos
    # pairwise similarity structure (what the place DB ranks on) preserved
    s32 = d32 @ d32.T
    s16 = d16 @ d16.T
    assert np.max(np.abs(s32 - s16)) < 0.02
