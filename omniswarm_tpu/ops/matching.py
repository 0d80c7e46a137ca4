"""Descriptor matching as batched matmul + argmax (MXU-native).

Replaces the reference's OpenCV BFMatcher with cross-check
(match_HFNet_local_features, loop_cam.cpp:141-174, and the per-direction
BFMatch in loop_detector.cpp:539-624): similarity of unit descriptors is one
(K, M) matmul; mutual-nearest-neighbor + threshold gating are vectorized
masks. Fixed shapes, validity masks instead of dynamic match lists.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    idx_b: jnp.ndarray   # (K,) best b-index per a-keypoint
    sim: jnp.ndarray     # (K,) cosine similarity of that match
    mask: jnp.ndarray    # (K,) bool — mutual, above-threshold, both valid


def mutual_match(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                 valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                 *, min_similarity: float = 0.0) -> Matches:
    """Mutual-NN matching of unit descriptors.

    desc_a: (K, C), desc_b: (M, C). min_similarity is the inner-product
    threshold (an L2 threshold d on unit vectors ≡ ip > 1 - d^2/2).
    """
    sim = desc_a @ desc_b.T                                  # (K, M) — MXU
    neg = jnp.asarray(-jnp.inf, sim.dtype)
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)
    best_b = jnp.argmax(sim, axis=1)                         # (K,)
    best_a = jnp.argmax(sim, axis=0)                         # (M,)
    best_sim = jnp.take_along_axis(sim, best_b[:, None], axis=1)[:, 0]
    k_idx = jnp.arange(desc_a.shape[0])
    mutual = best_a[best_b] == k_idx
    mask = mutual & (best_sim > min_similarity) & valid_a
    return Matches(best_b.astype(jnp.int32), best_sim, mask)
