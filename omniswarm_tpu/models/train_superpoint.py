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


def make_warped_pairs(rng, batch: int, h: int, w: int, *,
                      max_rot: float = 0.3, max_shift: float = 12.0,
                      scale=(1.0, 1.0)):
    """Rendered image pairs under a known rigid warp.

    Returns (imgs_a, imgs_b, T_ba (B, 2, 3)) where a pixel p_a in image A
    corresponds to p_b = T_ba[:, :2] @ p_a + T_ba[:, 2] in image B
    (pixel coords (x, y)). Image B is the same scene resampled under a
    rotation about the image center plus a translation, with independent
    brightness jitter and noise — the descriptor head must make
    corresponding cells agree across the warp.
    """
    imgs_a = np.zeros((batch, h, w, 1), np.float32)
    imgs_b = np.zeros((batch, h, w, 1), np.float32)
    T_ba = np.zeros((batch, 2, 3), np.float32)
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    for b in range(batch):
        img, _ = render_shapes(rng, h, w, n_shapes=6)
        imgs_a[b, :, :, 0] = img
        ang = rng.uniform(-max_rot, max_rot)
        zoom = rng.uniform(*scale)
        tx = rng.uniform(-max_shift, max_shift)
        ty = rng.uniform(-max_shift, max_shift)
        c, s = np.cos(ang) * zoom, np.sin(ang) * zoom
        cx, cy = w / 2.0, h / 2.0
        # forward map a→b around the image center (rotation+zoom+shift)
        # p_b = z R (p_a - ctr) + ctr + t
        T_ba[b] = [[c, -s, cx - c * cx + s * cy + tx],
                   [s, c, cy - s * cx - c * cy + ty]]
        # render B by inverse-warping:
        # p_a = (zR)^-1 (p_b - ctr - t) + ctr
        xb = xs - cx - tx
        yb = ys - cy - ty
        z2 = zoom * zoom
        xa = (c * xb + s * yb) / z2 + cx
        ya = (-s * xb + c * yb) / z2 + cy
        x0 = np.clip(np.floor(xa).astype(int), 0, w - 2)
        y0 = np.clip(np.floor(ya).astype(int), 0, h - 2)
        fx = np.clip(xa - x0, 0, 1)
        fy = np.clip(ya - y0, 0, 1)
        v = (img[y0, x0] * (1 - fy) * (1 - fx)
             + img[y0 + 1, x0] * fy * (1 - fx)
             + img[y0, x0 + 1] * (1 - fy) * fx
             + img[y0 + 1, x0 + 1] * fy * fx)
        inside = (xa >= 0) & (xa < w - 1) & (ya >= 0) & (ya < h - 1)
        v = np.where(inside, v, 0.0)
        gain = rng.uniform(0.8, 1.2)
        v = np.clip(v * gain + rng.normal(0, 0.02, v.shape), 0, 1)
        imgs_b[b, :, :, 0] = v
    return jnp.asarray(imgs_a), jnp.asarray(imgs_b), jnp.asarray(T_ba)


def descriptor_loss(params, model, imgs_a, imgs_b, T_ba,
                    *, temperature: float = 0.1):
    """Dense InfoNCE over warped cell correspondences.

    Every A-cell whose warped center lands within half a cell of some
    B-cell center must retrieve that B-cell among all B-cells of the same
    image (softmax cross-entropy over inner products / temperature), and
    symmetrically B→A. Unlike the original hinge formulation this has no
    margin constants and no all-identical-descriptor saddle (the softmax
    normalizer penalizes collapse directly) — the hinge variant measurably
    collapsed on L2-normalized descriptors (loss plateau at the
    uniform-similarity value).
    """
    B, h, w, _ = imgs_a.shape
    hc, wc = h // 8, w // 8
    _, da = model.apply(params, imgs_a)                        # (B,hc,wc,C)
    _, db = model.apply(params, imgs_b)
    da = da.reshape(B, hc * wc, -1)
    db = db.reshape(B, hc * wc, -1)

    ys, xs = jnp.mgrid[:hc, :wc]
    ctr = jnp.stack([xs * 8.0 + 4.0, ys * 8.0 + 4.0], -1).reshape(-1, 2)
    warped = (jnp.einsum("bij,nj->bni", T_ba[:, :, :2], ctr)
              + T_ba[:, None, :, 2])                          # (B, Na, 2)
    inside = ((warped[..., 0] >= 0) & (warped[..., 0] < w)
              & (warped[..., 1] >= 0) & (warped[..., 1] < h))
    d2 = jnp.sum((warped[:, :, None, :] - ctr[None, None]) ** 2, -1)
    tgt = jnp.argmin(d2, axis=-1)                              # (B, Na)
    ok = inside & (jnp.min(d2, axis=-1) <= 16.0)               # within 4 px

    dot = jnp.einsum("bnc,bmc->bnm", da, db) / temperature

    def xent(logits, target, valid):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], -1)[..., 0]
        vf = valid.astype(nll.dtype)
        return jnp.sum(nll * vf) / jnp.maximum(jnp.sum(vf), 1.0)

    # symmetric: A retrieves in B, and B retrieves in A. The B-cell's
    # correspondent is the A-cell whose warped center lands nearest it.
    d2T = jnp.swapaxes(d2, 1, 2)                               # (B, Nb, Na)
    tgt_b = jnp.argmin(d2T, axis=-1)
    ok_b = (jnp.min(d2T, axis=-1) <= 16.0) & jnp.take_along_axis(
        inside, tgt_b, axis=1)
    loss_ab = xent(dot, tgt, ok)
    loss_ba = xent(jnp.swapaxes(dot, 1, 2), tgt_b, ok_b)
    return 0.5 * (loss_ab + loss_ba)


def train_descriptors(*, steps: int = 500, batch: int = 8, h: int = 64,
                      w: int = 96, lr: float = 1e-3, seed: int = 0,
                      log_every: int = 50, params=None,
                      detector_weight: float = 1.0):
    """Joint detector + descriptor training (warped-pair supervision).

    Starts from ``params`` (e.g. the detector-only checkpoint) and optimizes
    the descriptor hinge loss together with the detector CE so corner
    quality is preserved while the descriptor head becomes
    viewpoint-discriminative.
    """
    import optax

    model = SuperPoint()
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 1)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs, labels, ia, ib, T):
        def loss_fn(p):
            ld = descriptor_loss(p, model, ia, ib, T)
            lc = detector_loss(p, model, imgs, labels)
            return ld + detector_weight * lc, (ld, lc)

        (loss, (ld, lc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ld, lc

    history = []
    for it in range(steps):
        imgs, labels = make_batch(rng, batch, h, w)
        ia, ib, T = make_warped_pairs(rng, batch, h, w)
        params, opt_state, loss, ld, lc = step(
            params, opt_state, imgs, labels, ia, ib, T)
        if it % log_every == 0 or it == steps - 1:
            history.append((it, float(loss), float(ld), float(lc)))
    return params, history


def matching_metrics(params, *, n_eval: int = 8, h: int = 64, w: int = 96,
                     seed: int = 77, top_k: int = 50, max_rot: float = 0.3,
                     max_shift: float = 12.0, scale=(1.0, 1.0)):
    """Cross-warp descriptor matching precision on held-out pairs.

    Detect keypoints in A, grid-sample descriptors in both views, mutual
    match, and score a match correct if it lands within 4 px of the warped
    ground-truth location.
    """
    from omniswarm_tpu.models.superpoint import SuperPointExtractor
    from omniswarm_tpu.ops.matching import mutual_match

    full = {"net": params["net"] if "net" in params else params}
    if "pca_components" in params:
        full["pca_components"] = params["pca_components"]
        full["pca_mean"] = params["pca_mean"]
    else:
        # JL random projection 256→64 stands in for the fitted PCA
        full["pca_components"] = jax.random.normal(
            jax.random.PRNGKey(0), (64, 256)) / 16.0
        full["pca_mean"] = jnp.zeros((256,))
    ex = SuperPointExtractor(full, height=h, width=w, max_keypoints=top_k,
                             threshold=0.015, nms_dist=4)
    rng = np.random.default_rng(seed)
    correct = total = 0
    for _ in range(n_eval):
        ia, ib, T = make_warped_pairs(rng, 1, h, w, max_rot=max_rot,
                                      max_shift=max_shift, scale=scale)
        xy_a, _, desc_a, va = ex(ia)
        xy_b, _, desc_b, vb = ex(ib)
        m = mutual_match(desc_a[0], desc_b[0], va[0], vb[0],
                         min_similarity=0.5)
        mask = np.asarray(m.mask)
        idx_b = np.asarray(m.idx_b)
        xa = np.asarray(xy_a[0], np.float32)
        xb = np.asarray(xy_b[0], np.float32)
        Tn = np.asarray(T[0])
        warped = xa @ Tn[:, :2].T + Tn[:, 2]
        for i in np.flatnonzero(mask):
            err = np.linalg.norm(warped[i] - xb[idx_b[i]])
            total += 1
            correct += bool(err < 4.0)
    return {"match_precision": correct / max(total, 1), "matches": total}


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
