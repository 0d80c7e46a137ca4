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


def _multiscale_noise(rng, h, w, octaves=4):
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        sh, sw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        base = rng.normal(0, 1.0 / (o + 1), size=(sh, sw)).astype(np.float32)
        ys = np.linspace(0, sh - 1, h)
        xs = np.linspace(0, sw - 1, w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, sh - 1)
        x1 = np.minimum(x0 + 1, sw - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        img += (base[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
                + base[np.ix_(y1, x0)] * fy * (1 - fx)
                + base[np.ix_(y0, x1)] * (1 - fy) * fx
                + base[np.ix_(y1, x1)] * fy * fx)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def _fill_polygon(img, pts, tex):
    """Fill a convex polygon with the given texture patch values."""
    h, w = img.shape
    ys, xs = np.mgrid[:h, :w]
    inside = np.ones((h, w), bool)
    n = len(pts)
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        crossz = (x1 - x0) * (ys - y0) - (y1 - y0) * (xs - x0)
        side = (x1 - x0) * (cy - y0) - (y1 - y0) * (cx - x0)
        inside &= (crossz * np.sign(side)) >= 0
    img[inside] = tex[inside]
    return img


def render_textured(rng: np.random.Generator, h: int, w: int,
                    n_shapes: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Photometric-realistic synthetic scene (VERDICT r4 item 8).

    Where render_shapes draws 1-px outlines on a flat background (the
    MagicPoint stage), this fills CONVEX TEXTURED polygons over a
    multi-scale-noise background, then applies a photometric pipeline —
    exposure gradient, gamma, brightness/contrast jitter, blur, sensor
    noise. Corners remain exactly known (polygon vertices), so the
    detector trains supervised on imagery that actually looks like
    surfaces instead of line art.
    """
    img = _multiscale_noise(rng, h, w) * rng.uniform(0.25, 0.55)
    corners = []
    for _ in range(n_shapes):
        nv = int(rng.integers(3, 6))
        cx, cy = rng.uniform(8, w - 8), rng.uniform(8, h - 8)
        r = rng.uniform(5, min(h, w) / 3)
        angs = np.sort(rng.uniform(0, 2 * np.pi, nv))
        pts = np.stack([cx + r * np.cos(angs), cy + r * np.sin(angs)], 1)
        pts[:, 0] = np.clip(pts[:, 0], 1, w - 2)
        pts[:, 1] = np.clip(pts[:, 1], 1, h - 2)
        tex = _multiscale_noise(rng, h, w)
        lo, hi = np.sort(rng.uniform(0.0, 1.0, 2))
        tex = lo + tex * max(hi - lo, 0.25)
        img = _fill_polygon(img, pts, tex)
        corners.extend(pts)
    # photometric pipeline
    gx = np.linspace(-1, 1, w)[None, :] * rng.uniform(-0.15, 0.15)
    gy = np.linspace(-1, 1, h)[:, None] * rng.uniform(-0.15, 0.15)
    img = img + gx + gy                         # exposure gradient
    img = np.clip(img, 0, 1) ** rng.uniform(0.7, 1.4)   # gamma
    img = (img - 0.5) * rng.uniform(0.7, 1.3) + rng.uniform(0.35, 0.6)
    if rng.uniform() < 0.5:                     # box blur (defocus/motion)
        k = 1
        img = (img
               + np.roll(img, k, 0) + np.roll(img, -k, 0)
               + np.roll(img, k, 1) + np.roll(img, -k, 1)) / 5.0
    img = img + rng.normal(0, rng.uniform(0.01, 0.05), img.shape)
    img = np.clip(img, 0, 1).astype(np.float32)
    return img, np.asarray(corners, np.float32)


def make_batch_textured(rng, batch: int, h: int, w: int):
    imgs = np.zeros((batch, h, w, 1), np.float32)
    labs = np.zeros((batch, h // 8, w // 8), np.int32)
    for b in range(batch):
        img, corners = render_textured(rng, h, w)
        imgs[b, :, :, 0] = img
        labs[b] = corner_label_map(corners, h, w)
    return jnp.asarray(imgs), jnp.asarray(labs)


def render_mixed(rng: np.random.Generator, h: int, w: int,
                 textured_frac: float = 0.75):
    """Textured surfaces most of the time, line-art sometimes — keeps the
    descriptor discriminative on BOTH imagery families the textured eval
    measures (SP_EVAL textured + flat rows)."""
    if rng.uniform() < textured_frac:
        return render_textured(rng, h, w)
    return render_shapes(rng, h, w, n_shapes=6)


def sample_raw_descriptors(params, *, n_images: int = 128, h: int = 64,
                           w: int = 96, seed: int = 3, top_k: int = 50,
                           render_fn=None, batch: int = 16) -> np.ndarray:
    """Raw (pre-PCA) 256-d descriptors at detected keypoints on rendered
    imagery — the input the reference's pca.ipynb fits its 256→64
    projection on (descriptors dumped from flight data). Used by
    tools/train_superpoint_tool.py --fit-pca to embed a fitted projection
    into the shipped checkpoint instead of the JL fallback."""
    from omniswarm_tpu.ops.keypoints import (
        bilinear_sample_descriptors, extract_keypoints)

    model = SuperPoint()
    net = params["net"] if "net" in params else params
    rng = np.random.default_rng(seed)
    if render_fn is None:
        render_fn = render_textured

    @jax.jit
    def run(imgs):
        heat, dc = model.apply(net, imgs)
        xy, sc, valid = jax.vmap(
            lambda hm: extract_keypoints(hm, max_keypoints=top_k,
                                         threshold=0.015, nms_dist=4))(heat)
        desc = jax.vmap(
            lambda d, p: bilinear_sample_descriptors(d, p, cell=8)
        )(dc, xy.astype(jnp.float32))
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return desc, valid

    out = []
    for s in range(0, n_images, batch):
        nb = min(batch, n_images - s)
        imgs = np.zeros((batch, h, w, 1), np.float32)
        for b in range(nb):
            imgs[b, :, :, 0] = render_fn(rng, h, w)[0]
        desc, valid = jax.device_get(run(jnp.asarray(imgs)))
        out.append(desc[:nb][valid[:nb]])
    return np.concatenate(out, 0)


def homographic_adaptation_labels(model, params, imgs: np.ndarray,
                                  rng: np.random.Generator, *,
                                  n_warps: int = 8,
                                  threshold: float = 0.15) -> np.ndarray:
    """Self-label a batch by averaging detector heatmaps over warps.

    The SuperPoint recipe's homographic adaptation (superpoint.ipynb
    provenance): run the current detector on ``n_warps`` warped copies of
    each image, warp the heatmaps back, average, and threshold into the
    per-cell 65-way label format. Detections stable across viewpoint
    survive; spurious single-view responses wash out.
    """
    B, h, w, _ = imgs.shape
    acc = np.zeros((B, h, w), np.float32)
    cnt = np.zeros((B, h, w), np.float32) + 1e-6
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    for k in range(n_warps):
        if k == 0:
            warped = imgs
            maps = None
        else:
            ang = rng.uniform(-0.4, 0.4)
            zoom = rng.uniform(0.85, 1.2)
            tx = rng.uniform(-8, 8)
            ty = rng.uniform(-8, 8)
            c, s = np.cos(ang) * zoom, np.sin(ang) * zoom
            cx, cy = w / 2.0, h / 2.0
            xb = xs - cx - tx
            yb = ys - cy - ty
            z2 = zoom * zoom
            xa = (c * xb + s * yb) / z2 + cx
            ya = (-s * xb + c * yb) / z2 + cy
            x0 = np.clip(np.floor(xa).astype(int), 0, w - 2)
            y0 = np.clip(np.floor(ya).astype(int), 0, h - 2)
            fx = np.clip(xa - x0, 0, 1)
            fy = np.clip(ya - y0, 0, 1)
            warped = np.zeros_like(imgs)
            for b in range(B):
                im = imgs[b, :, :, 0]
                v = (im[y0, x0] * (1 - fy) * (1 - fx)
                     + im[y0 + 1, x0] * fy * (1 - fx)
                     + im[y0, x0 + 1] * (1 - fy) * fx
                     + im[y0 + 1, x0 + 1] * fy * fx)
                warped[b, :, :, 0] = v
            maps = (xa, ya)
        heat, _ = model.apply(params, jnp.asarray(warped))
        heat = np.asarray(heat)                 # (B, h, w)
        if maps is None:
            acc += heat
            cnt += 1.0
        else:
            xa, ya = maps
            inside = (xa >= 0) & (xa < w - 1) & (ya >= 0) & (ya < h - 1)
            # heat at warped pixel (xa, ya) belongs to source pixel (x, y)
            xi = np.clip(np.round(xa).astype(int), 0, w - 1)
            yi = np.clip(np.round(ya).astype(int), 0, h - 1)
            for b in range(B):
                np.add.at(acc[b], (yi[inside], xi[inside]),
                          heat[b][inside])
                np.add.at(cnt[b], (yi[inside], xi[inside]), 1.0)
    mean = acc / cnt
    hc, wc = h // 8, w // 8
    labs = np.full((B, hc, wc), 64, np.int32)
    for b in range(B):
        m = mean[b]
        cells = m[:hc * 8, :wc * 8].reshape(hc, 8, wc, 8).transpose(
            0, 2, 1, 3).reshape(hc, wc, 64)
        best = cells.argmax(-1)
        val = cells.max(-1)
        lab = np.where(val >= threshold, best, 64)
        labs[b] = lab
    return labs


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
                   log_every: int = 50, params=None, batch_fn=None,
                   ha_every: int = 0, ha_warps: int = 8,
                   start_step: int = 0, save_every: int = 0, save_fn=None,
                   log_fn=None):
    """Train the detector head. Returns (params, history).

    batch_fn(rng, batch, h, w) -> (imgs, labels): make_batch (MagicPoint
    line-art stage) or make_batch_textured (photometric stage).
    ``ha_every`` > 0 interleaves homographic-adaptation self-labeling:
    every ha_every-th batch's labels are replaced by warp-averaged
    detections of the CURRENT model (stable-under-viewpoint corners),
    the SuperPoint stage-2 recipe."""
    import optax

    model = SuperPoint()
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 1)))
    if batch_fn is None:
        batch_fn = make_batch
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
    for it in range(start_step, steps):
        imgs, labels = batch_fn(rng, batch, h, w)
        if ha_every > 0 and it % ha_every == ha_every - 1:
            labels = jnp.asarray(homographic_adaptation_labels(
                model, params, np.asarray(imgs), rng, n_warps=ha_warps))
        params, opt_state, loss = step(params, opt_state, imgs, labels)
        if it % log_every == 0 or it == steps - 1:
            history.append((it, float(loss)))
            if log_fn is not None:
                log_fn(history[-1])
        if save_fn is not None and save_every > 0 \
                and (it + 1) % save_every == 0:
            save_fn(params, it + 1)
    return params, history


def make_warped_pairs(rng, batch: int, h: int, w: int, *,
                      max_rot: float = 0.3, max_shift: float = 12.0,
                      scale=(1.0, 1.0), render_fn=None):
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
        if render_fn is None:
            img, _ = render_shapes(rng, h, w, n_shapes=6)
        else:
            img, _ = render_fn(rng, h, w)
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
                      detector_weight: float = 1.0, batch_fn=None,
                      render_fn=None, max_rot: float = 0.3,
                      max_shift: float = 12.0, scale=(1.0, 1.0),
                      start_step: int = 0, save_every: int = 0,
                      save_fn=None, log_fn=None):
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

    if batch_fn is None:
        batch_fn = make_batch
    history = []
    for it in range(start_step, steps):
        imgs, labels = batch_fn(rng, batch, h, w)
        ia, ib, T = make_warped_pairs(rng, batch, h, w, max_rot=max_rot,
                                      max_shift=max_shift, scale=scale,
                                      render_fn=render_fn)
        params, opt_state, loss, ld, lc = step(
            params, opt_state, imgs, labels, ia, ib, T)
        if it % log_every == 0 or it == steps - 1:
            history.append((it, float(loss), float(ld), float(lc)))
            if log_fn is not None:
                log_fn(history[-1])
        if save_fn is not None and save_every > 0 \
                and (it + 1) % save_every == 0:
            save_fn(params, it + 1)
    return params, history


def matching_metrics(params, *, n_eval: int = 8, h: int = 64, w: int = 96,
                     seed: int = 77, top_k: int = 50, max_rot: float = 0.3,
                     max_shift: float = 12.0, scale=(1.0, 1.0),
                     render_fn=None):
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
                                      max_shift=max_shift, scale=scale,
                                      render_fn=render_fn)
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
