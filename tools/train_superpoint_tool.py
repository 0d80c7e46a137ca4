#!/usr/bin/env python
"""Train the SuperPoint detector+descriptor and save a checkpoint.

Runs on whatever backend jax picks (the real TPU under axon); the saved
checkpoint loads into SuperPointExtractor via models.superpoint.load_flax_npz.

Stages (reproducing the SuperPoint curriculum the reference's pretrained
weights came from, superpoint.ipynb provenance, in a zero-egress world):
  magicpoint  — detector on line-art synthetic corners.
  photometric — detector on textured surfaces + photometric jitter, with
                homographic-adaptation self-labeling, then joint
                detector+descriptor on warped textured pairs whose warp
                distribution MATCHES the eval (rotation + zoom + shift).

Resumable for tools/run_with_retry.sh: --save-every N --continue-out keeps
OUT.resume.npz + OUT.state.json current so a relaunch continues mid-stage.

    tools/run_with_retry.sh /tmp/sp.log '^step' 330 240 \
      python tools/train_superpoint_tool.py --stage photometric \
        --steps 2000 --descriptor-steps 4000 \
        --resume omniswarm_tpu/models/weights/superpoint_synthetic.npz \
        --save-every 200 --continue-out --fit-pca 256 \
        --out omniswarm_tpu/models/weights/superpoint_photo_v2.npz
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--desc-batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--desc-lr", type=float, default=5e-4)
    ap.add_argument("--descriptor-steps", type=int, default=0,
                    help="joint detector+descriptor steps (stage 2)")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--stage", default="magicpoint",
                    choices=["magicpoint", "photometric"],
                    help="photometric = textured surfaces + photometric "
                         "jitter + homographic-adaptation self-labeling "
                         "(VERDICT r4 item 8 / r5 item 1)")
    ap.add_argument("--ha-every", type=int, default=4,
                    help="photometric stage: every Nth batch self-labels "
                         "via homographic adaptation (0 disables)")
    # descriptor warp curriculum — defaults MATCH the textured eval
    # distribution (eval_superpoint_textured.py: max_rot 0.5, zoom
    # 0.85-1.2); r4 trained at rot 0.3 / no zoom and measured 0.724
    # precision, a plain train/eval warp mismatch.
    ap.add_argument("--max-rot", type=float, default=0.55)
    ap.add_argument("--max-shift", type=float, default=12.0)
    ap.add_argument("--scale-lo", type=float, default=0.8)
    ap.add_argument("--scale-hi", type=float, default=1.25)
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint OUT.resume.npz every N steps")
    ap.add_argument("--continue-out", action="store_true",
                    help="resume mid-stage from OUT.resume.npz/state.json "
                         "(stall-relaunch safe)")
    ap.add_argument("--fit-pca", type=int, default=0,
                    help="fit the 256->64 descriptor PCA on N rendered "
                         "images and embed it in the checkpoint")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from omniswarm_tpu.models.superpoint import load_flax_npz, save_flax_npz
    from omniswarm_tpu.models.train_superpoint import (
        detection_metrics,
        make_batch_textured,
        matching_metrics,
        render_mixed,
        render_textured,
        sample_raw_descriptors,
        train_descriptors,
        train_detector,
    )

    photo = args.stage == "photometric"
    batch_fn = make_batch_textured if photo else None
    render_fn = render_mixed if photo else None

    state_path = args.out + ".state.json"
    resume_path = args.out + ".resume.npz"
    state = {"stage": "detector", "step": 0}
    params = None
    if args.continue_out and os.path.exists(state_path) \
            and os.path.exists(resume_path):
        with open(state_path) as f:
            state = json.load(f)
        params = load_flax_npz(resume_path)
        print(f"step resume: stage={state['stage']} step={state['step']}",
              flush=True)
    elif args.resume:
        loaded = load_flax_npz(args.resume)
        params = {"net": loaded["net"]}

    def save_fn_for(stage):
        def save(p, it):
            save_flax_npz(p, resume_path)
            with open(state_path, "w") as f:
                json.dump({"stage": stage, "step": it}, f)
        return save

    def log_det(h):
        it, loss = h
        print(f"step {it:5d} loss {loss:.4f}", flush=True)

    def log_desc(h):
        it, loss, ld, lc = h
        print(f"step {it:5d} loss {loss:.4f} (desc {ld:.4f} det {lc:.4f})",
              flush=True)

    if args.steps > 0 and state["stage"] == "detector":
        start = state["step"]
        params, _ = train_detector(
            steps=args.steps, batch=args.batch, h=args.height, w=args.width,
            lr=args.lr, log_every=max(args.steps // 40, 1),
            params=params["net"] if params and "net" in params else params,
            batch_fn=batch_fn, ha_every=args.ha_every if photo else 0,
            start_step=start, save_every=args.save_every,
            save_fn=save_fn_for("detector"), log_fn=log_det)
        state = {"stage": "descriptor", "step": 0}
        save_fn_for("descriptor")(params, 0)
    elif params is not None and "net" in params:
        params = params["net"]

    if args.descriptor_steps > 0 and state["stage"] in (
            "detector", "descriptor"):
        start = state["step"] if state["stage"] == "descriptor" else 0
        params, _ = train_descriptors(
            steps=args.descriptor_steps, batch=args.desc_batch,
            h=args.height, w=args.width, lr=args.desc_lr, params=params,
            log_every=max(args.descriptor_steps // 40, 1),
            batch_fn=batch_fn, render_fn=render_fn,
            max_rot=args.max_rot, max_shift=args.max_shift,
            scale=(args.scale_lo, args.scale_hi),
            start_step=start, save_every=args.save_every,
            save_fn=save_fn_for("descriptor"), log_fn=log_desc)

    full = {"net": params["net"] if "net" in params else params}
    if args.fit_pca > 0:
        from tools.fit_pca import fit_pca

        desc = sample_raw_descriptors(
            full, n_images=args.fit_pca, h=args.height, w=args.width,
            render_fn=render_textured if photo else None)
        comps, mean, ratio = fit_pca(desc, 64)
        print(f"step pca: {desc.shape[0]} descs, explained "
              f"{ratio.sum():.3f}", flush=True)
        import jax.numpy as jnp
        full["pca_components"] = jnp.asarray(comps)
        full["pca_mean"] = jnp.asarray(mean)

    if args.descriptor_steps > 0:
        mm = matching_metrics(full, n_eval=16,
                              h=args.height, w=args.width,
                              max_rot=0.5, max_shift=12.0,
                              scale=(0.85, 1.2),
                              render_fn=render_textured if photo else None)
        print(f"eval: match precision {mm['match_precision']:.3f} "
              f"over {mm['matches']} matches", flush=True)
    m = detection_metrics(full["net"], n_eval=32)
    print(f"eval: precision {m['precision']:.3f} recall {m['recall']:.3f}",
          flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_flax_npz(full, args.out)
    with open(state_path, "w") as f:
        json.dump({"stage": "done", "step": 0}, f)
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
