"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from omniswarm_tpu.ops import keypoints as kp
from omniswarm_tpu.ops.pallas_kernels import grid_nms_pallas, retrieval_top1_pallas


def test_pallas_nms_matches_xla(rng):
    heat = jnp.asarray(rng.uniform(size=(64, 128)).astype(np.float32)) ** 8
    ref = np.asarray(kp.grid_nms(heat, nms_dist=4))
    out = np.asarray(grid_nms_pallas(heat, nms_dist=4))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pallas_nms_isolated_peaks():
    heat = np.zeros((32, 128), np.float32)
    heat[5, 5] = 1.0
    heat[5, 7] = 0.8
    heat[20, 100] = 0.9
    out = np.asarray(grid_nms_pallas(jnp.asarray(heat), nms_dist=4))
    assert out[5, 5] == 1.0 and out[5, 7] == 0.0 and out[20, 100] == 0.9


def test_pallas_retrieval_matches_argmax(rng):
    N, D = 256, 128
    db = rng.normal(size=(N, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[37] + rng.normal(0, 0.01, size=D).astype(np.float32)
    q /= np.linalg.norm(q)
    mask = np.ones(N, bool)
    mask[37] = True
    best, sim = retrieval_top1_pallas(jnp.asarray(db), jnp.asarray(q),
                                      jnp.asarray(mask))
    assert int(best) == 37
    assert float(sim) > 0.99
    # masked-out winner falls through to runner-up
    mask[37] = False
    best2, _ = retrieval_top1_pallas(jnp.asarray(db), jnp.asarray(q),
                                     jnp.asarray(mask))
    assert int(best2) != 37
