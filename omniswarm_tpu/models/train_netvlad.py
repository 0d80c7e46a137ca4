"""MobileNetVLAD place-recognition training on synthetic places.

The reference ships a pretrained MobileNetVLAD TensorRT engine producing
4096-d global descriptors for loop-closure candidate retrieval
(/root/reference/swarm_loop/src/mobilenetvlad_tensorrt.cpp; queried through
faiss IndexFlatIP in loop_detector.cpp:176-242). In a zero-egress
environment we train the same architecture from scratch on synthetic
*places*: each place is a unique canvas of random geometric structure, and
views of a place are crops under rotation/translation/brightness jitter.
An in-batch NT-Xent contrastive objective pulls views of the same place
together on the descriptor hypersphere and pushes different places apart —
exactly the retrieval geometry the loop detector's inner-product query
needs.

Evaluation is retrieval recall@1 on held-out places: a query view must
retrieve the right place's gallery view by inner product.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniswarm_tpu.models.netvlad import (
    BUNDLED_CLUSTERS,
    BUNDLED_OUT_DIM,
    MobileNetVLAD,
)
from omniswarm_tpu.models.train_superpoint import render_shapes


# ---------------------------------------------------------------------------
# Synthetic places (host-side numpy)
# ---------------------------------------------------------------------------

def render_place(rng: np.random.Generator, h: int, w: int,
                 textured: bool = False) -> np.ndarray:
    """A place = a dense canvas of shapes (more structure than a view).

    ``textured``: filled textured polygons over multi-scale noise
    (train_superpoint.render_textured) instead of line art — the imagery
    family the image demo's RoomWorld walls actually look like. The r4
    demo's missed revisits all sat at NetVLAD sim ~0.985: descriptors
    trained on line art saturate on texture statistics."""
    if textured:
        from omniswarm_tpu.models.train_superpoint import render_textured

        img, _ = render_textured(rng, h, w,
                                 n_shapes=int(rng.integers(8, 14)))
        return img
    img, _ = render_shapes(rng, h, w, n_shapes=int(rng.integers(10, 18)))
    return img


def render_view(rng: np.random.Generator, place: np.ndarray, vh: int,
                vw: int, *, max_rot: float = 0.25,
                noise: float = 0.03,
                scale: Tuple[float, float] = (1.0, 1.0),
                center=None, return_center: bool = False):
    """A view of a place: rotated/translated crop + brightness jitter.

    Bilinear sampling of the canvas under a rigid transform — the synthetic
    analog of revisiting a place from a different pose/exposure. ``center``
    pins the crop center (clipped to the valid margin); with
    ``return_center`` the (cy, cx) actually used is returned alongside, so
    callers can place a *revisit* view at a bounded offset from it.
    """
    ph, pw = place.shape
    ang = rng.uniform(-max_rot, max_rot)
    zoom = rng.uniform(*scale)
    c, s = np.cos(ang) * zoom, np.sin(ang) * zoom
    # view center placed so the rotated crop stays inside the canvas
    margin_y = min(0.5 * np.hypot(vh, vw) + 2, (ph - 2) / 2.0)
    margin_x = min(0.5 * np.hypot(vh, vw) + 2, (pw - 2) / 2.0)
    if center is None:
        cy = rng.uniform(margin_y, ph - margin_y)
        cx = rng.uniform(margin_x, pw - margin_x)
    else:
        cy = float(np.clip(center[0], margin_y, ph - margin_y))
        cx = float(np.clip(center[1], margin_x, pw - margin_x))
    ys, xs = np.mgrid[:vh, :vw].astype(np.float32)
    ys -= vh / 2.0
    xs -= vw / 2.0
    sy = cy + c * ys - s * xs
    sx = cx + s * ys + c * xs
    y0 = np.clip(np.floor(sy).astype(int), 0, ph - 2)
    x0 = np.clip(np.floor(sx).astype(int), 0, pw - 2)
    fy = np.clip(sy - y0, 0, 1)
    fx = np.clip(sx - x0, 0, 1)
    v = (place[y0, x0] * (1 - fy) * (1 - fx)
         + place[y0 + 1, x0] * fy * (1 - fx)
         + place[y0, x0 + 1] * (1 - fy) * fx
         + place[y0 + 1, x0 + 1] * fy * fx)
    gain = rng.uniform(0.7, 1.3)
    bias = rng.uniform(-0.1, 0.1)
    v = np.clip(v * gain + bias
                + rng.normal(0, noise, v.shape).astype(np.float32), 0, 1)
    v = v.astype(np.float32)
    if return_center:
        return v, (cy, cx)
    return v


class PlacePool:
    """Pre-rendered canvas pool sampled for (place, 2 views) batches."""

    def __init__(self, n_places: int = 256, canvas: Tuple[int, int] = (224, 352),
                 view: Tuple[int, int] = (96, 160), seed: int = 0,
                 textured: bool = False):
        self.rng = np.random.default_rng(seed)
        self.view = view
        self.places = [render_place(self.rng, *canvas, textured=textured)
                       for _ in range(n_places)]

    def batch(self, n: int) -> np.ndarray:
        """(2n, vh, vw, 1): rows [0:n] and [n:2n] are paired views."""
        idx = self.rng.choice(len(self.places), size=n, replace=False)
        vh, vw = self.view
        out = np.zeros((2 * n, vh, vw, 1), np.float32)
        for i, pi in enumerate(idx):
            out[i, :, :, 0] = render_view(self.rng, self.places[pi], vh, vw)
            out[n + i, :, :, 0] = render_view(self.rng, self.places[pi],
                                              vh, vw)
        return out


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def ntxent_loss(desc: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """In-batch NT-Xent over (2n, D) unit descriptors, pairs (i, n+i)."""
    n = desc.shape[0] // 2
    sim = desc @ desc.T / temperature                     # (2n, 2n)
    sim = sim - 1e9 * jnp.eye(2 * n)                      # mask self
    targets = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], 1))


def device_render_views(places: jnp.ndarray, idx: jnp.ndarray,
                        key: jnp.ndarray, vh: int, vw: int, *,
                        max_rot: float = 0.25,
                        noise: float = 0.03,
                        scale: Tuple[float, float] = (1.0, 1.0),
                        centers: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """JAX twin of render_view: rotated/translated bilinear crops on device.

    places (N, ph, pw), idx (n,) → (n, vh, vw, 1). Keeps the training loop
    free of host-side rendering (the numpy warp was the step bottleneck).
    ``centers`` (n, 2) pins crop centers in canvas pixels (clipped to the
    valid margin) — used by the revisit curriculum to render view pairs
    with bounded offset.
    """
    ph, pw = places.shape[1:]
    n = idx.shape[0]
    ka, kc, kg, kb, kn, kz = jax.random.split(key, 6)
    pl = places[idx]
    ang = jax.random.uniform(ka, (n,), minval=-max_rot, maxval=max_rot)
    zoom = jax.random.uniform(kz, (n,), minval=scale[0], maxval=scale[1])
    c, s = jnp.cos(ang) * zoom, jnp.sin(ang) * zoom
    my = min(0.5 * float(np.hypot(vh, vw)) + 2, (ph - 2) / 2.0)
    mx = min(0.5 * float(np.hypot(vh, vw)) + 2, (pw - 2) / 2.0)
    if centers is None:
        ctr = jax.random.uniform(kc, (n, 2))
        cy = my + ctr[:, 0] * (ph - 2 * my)
        cx = mx + ctr[:, 1] * (pw - 2 * mx)
    else:
        cy = jnp.clip(centers[:, 0], my, ph - my)
        cx = jnp.clip(centers[:, 1], mx, pw - mx)
    ys, xs = jnp.mgrid[:vh, :vw]
    ys = ys.astype(jnp.float32) - vh / 2.0
    xs = xs.astype(jnp.float32) - vw / 2.0
    sy = cy[:, None, None] + c[:, None, None] * ys - s[:, None, None] * xs
    sx = cx[:, None, None] + s[:, None, None] * ys + c[:, None, None] * xs
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, ph - 2)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, pw - 2)
    fy = jnp.clip(sy - y0, 0, 1)
    fx = jnp.clip(sx - x0, 0, 1)
    gather = jax.vmap(lambda p, yy, xx: p[yy, xx])
    v = (gather(pl, y0, x0) * (1 - fy) * (1 - fx)
         + gather(pl, y0 + 1, x0) * fy * (1 - fx)
         + gather(pl, y0, x0 + 1) * (1 - fy) * fx
         + gather(pl, y0 + 1, x0 + 1) * fy * fx)
    gain = jax.random.uniform(kg, (n, 1, 1), minval=0.7, maxval=1.3)
    bias = jax.random.uniform(kb, (n, 1, 1), minval=-0.1, maxval=0.1)
    v = jnp.clip(v * gain + bias
                 + noise * jax.random.normal(kn, v.shape), 0, 1)
    return v[..., None]


def _save_resume(path: str, params, opt_state) -> None:
    """Atomic full-precision (params, optimizer-state) snapshot."""
    import os

    leaves = jax.tree_util.tree_leaves((params, opt_state))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{f"leaf_{i}": np.asarray(x)
                     for i, x in enumerate(leaves)})
    os.replace(tmp, path)


def _load_resume(path: str, params0, opt_state0):
    """Inverse of _save_resume; shapes must match the fresh init."""
    raw = np.load(path)
    treedef = jax.tree_util.tree_structure((params0, opt_state0))
    leaves = [raw[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def train_netvlad(*, steps: int = 600, places_per_batch: int = 16,
                  pool_size: int = 256, lr: float = 3e-4, seed: int = 0,
                  view: Tuple[int, int] = (96, 160), log_every: int = 50,
                  params=None, temperature: float = 0.1,
                  max_rot: float = 0.25, noise: float = 0.03,
                  scale: Tuple[float, float] = (1.0, 1.0),
                  cosine: bool = False, verbose: bool = False,
                  revisit_offset: Optional[float] = None,
                  save_every: Optional[int] = None,
                  save_path: Optional[str] = None,
                  resume_path: Optional[str] = None,
                  encoder_version: int = 1,
                  textured: bool = False):
    """Train MobileNetVLAD (bundled architecture). Returns (params, history).

    The place pool renders once on the host; each step samples views and
    runs the contrastive update entirely on device. With
    ``revisit_offset=f`` the two views of a place are rendered at crop
    centers within f*(vh, vw) pixels of each other (loop-closure *revisit*
    semantics — overlapping content, full rotation/zoom/lighting jitter);
    without it centers are independent across the whole canvas.

    ``resume_path``: sidecar .npz holding full-precision params AND the
    optimizer state, written at every periodic checkpoint. A stall-relaunch
    resuming from it keeps Adam momentum and avoids the f16 quantization of
    the portable checkpoint (the f16 npz stays the deployment artifact).
    """
    import optax

    vh, vw = view
    model = MobileNetVLAD(num_clusters=BUNDLED_CLUSTERS,
                          out_dim=BUNDLED_OUT_DIM, use_proj=False,
                          encoder_version=encoder_version)
    pool = PlacePool(pool_size, view=view, seed=seed,
                     textured=textured)
    places_dev = jax.device_put(jnp.asarray(np.stack(pool.places)))
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1,) + view + (1,), jnp.float32))
    if cosine:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=max(steps // 20, 10),
            decay_steps=steps, end_value=lr * 0.01)
        tx = optax.adam(sched)
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)
    if resume_path is not None:
        import os

        if os.path.exists(resume_path):
            params, opt_state = _load_resume(resume_path, params, opt_state)

    @jax.jit
    def step(params, opt_state, places, idx, key):
        k1, k2, kc, kd = jax.random.split(key, 4)
        if revisit_offset is None:
            ca = cb = None
        else:
            ph, pw = places.shape[1:]
            n = idx.shape[0]
            # sample anchors WITHIN the rotation-safe margins (same band as
            # device_render_views / retrieval_metrics) — uniform over the
            # full canvas would clip ~85% of anchors onto the two boundary
            # rows, collapsing the pair offset at the edges
            my = min(0.5 * float(np.hypot(vh, vw)) + 2, (ph - 2) / 2.0)
            mx = min(0.5 * float(np.hypot(vh, vw)) + 2, (pw - 2) / 2.0)
            u = jax.random.uniform(kc, (n, 2))
            ca = (jnp.asarray([my, mx], jnp.float32)
                  + u * jnp.asarray([ph - 2 * my, pw - 2 * mx], jnp.float32))
            delta = jax.random.uniform(kd, (n, 2), minval=-1.0, maxval=1.0)
            cb = ca + delta * jnp.asarray(
                [revisit_offset * vh, revisit_offset * vw], jnp.float32)
        va = device_render_views(places, idx, k1, vh, vw, max_rot=max_rot,
                                 noise=noise, scale=scale, centers=ca)
        vb = device_render_views(places, idx, k2, vh, vw, max_rot=max_rot,
                                 noise=noise, scale=scale, centers=cb)
        imgs = jnp.concatenate([va, vb], 0)

        def loss_fn(p):
            return ntxent_loss(model.apply(p, imgs), temperature)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.default_rng(seed + 1)
    history = []
    for it in range(steps):
        idx = jnp.asarray(rng.choice(pool_size, size=places_per_batch,
                                     replace=False))
        params, opt_state, loss = step(
            params, opt_state, places_dev, idx,
            jax.random.PRNGKey(seed * 100003 + it))
        if it % log_every == 0 or it == steps - 1:
            history.append((it, float(loss)))
            if verbose:
                print(f"step {it:5d} loss {float(loss):.4f}", flush=True)
        if (save_every and save_path and it > 0
                and (it % save_every == 0 or it == steps - 1)):
            # periodic checkpoint so a relaunch after a tunnel stall
            # resumes instead of restarting (atomic replace)
            import os

            from omniswarm_tpu.models.netvlad import save_netvlad_npz

            tmp = save_path + ".tmp.npz"
            save_netvlad_npz(params, tmp, encoder_version=encoder_version)
            os.replace(tmp, save_path)
            if resume_path is not None:
                _save_resume(resume_path, params, opt_state)
    return params, history


def retrieval_metrics(params, *, n_places: int = 64, seed: int = 123,
                      view: Tuple[int, int] = (96, 160),
                      batch: int = 32, max_rot: float = 0.25,
                      noise: float = 0.03,
                      scale: Tuple[float, float] = (1.0, 1.0),
                      revisit_offset: Optional[float] = None,
                      encoder_version: int = 1,
                      textured: bool = False):
    """recall@1 + similarity margin on held-out places (gallery vs query).

    Hardness knobs (rotation/lighting-noise/zoom jitter + n_places) define
    the benchmark tier. The round-2 *hard* tier is the 256-way revisit
    benchmark: max_rot=0.5, noise=0.06, scale=(0.8, 1.25),
    revisit_offset=0.35 — the query revisits the gallery viewpoint within
    35% of the view size (guaranteed-overlapping content, like a
    loop-closure revisit; the reference's NetVLAD is likewise queried on
    revisits of mapped viewpoints, loop_detector.cpp:176-242), under full
    rotation/zoom/lighting jitter. Without revisit_offset the query crop
    center is independent of the gallery's — mostly-disjoint content at
    view≪canvas, which probes place *coverage*, not recognition."""
    model = MobileNetVLAD(num_clusters=BUNDLED_CLUSTERS,
                          out_dim=BUNDLED_OUT_DIM, use_proj=False,
                          encoder_version=encoder_version)
    pool = PlacePool(n_places, seed=seed, view=view,
                     textured=textured)
    vh, vw = view
    gal = np.zeros((n_places, vh, vw, 1), np.float32)
    qry = np.zeros((n_places, vh, vw, 1), np.float32)
    for i, p in enumerate(pool.places):
        gal[i, :, :, 0], c = render_view(pool.rng, p, vh, vw,
                                         max_rot=max_rot, noise=noise,
                                         scale=scale, return_center=True)
        qc = None
        if revisit_offset is not None:
            qc = (c[0] + pool.rng.uniform(-1, 1) * revisit_offset * vh,
                  c[1] + pool.rng.uniform(-1, 1) * revisit_offset * vw)
        qry[i, :, :, 0] = render_view(pool.rng, p, vh, vw, max_rot=max_rot,
                                      noise=noise, scale=scale, center=qc)

    apply = jax.jit(model.apply)

    def descs(imgs):
        out = []
        for i in range(0, len(imgs), batch):
            chunk = imgs[i:i + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     np.float32)], 0)
            out.append(np.asarray(apply(params, jnp.asarray(chunk)))[
                :len(imgs[i:i + batch])])
        return np.concatenate(out, 0)

    dg = descs(gal)
    dq = descs(qry)
    sim = dq @ dg.T                                       # (Q, G)
    top1 = np.argmax(sim, axis=1)
    recall1 = float(np.mean(top1 == np.arange(n_places)))
    pos = np.diag(sim)
    neg = sim - 2.0 * np.eye(n_places)
    margin = float(np.mean(pos - neg.max(axis=1)))
    return {"recall_at_1": recall1, "mean_margin": margin,
            "mean_pos_sim": float(pos.mean()),
            "mean_top_neg_sim": float(neg.max(axis=1).mean())}
