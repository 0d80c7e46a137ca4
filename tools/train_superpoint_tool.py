#!/usr/bin/env python
"""Train the SuperPoint detector on synthetic geometry and save a checkpoint.

Runs on whatever backend jax picks (the real TPU under axon); the saved
checkpoint loads into SuperPointExtractor via models.superpoint.load_flax_npz.

    python tools/train_superpoint_tool.py --steps 2000 --out weights/sp.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--descriptor-steps", type=int, default=0,
                    help="joint detector+descriptor steps (stage 2)")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--stage", default="magicpoint",
                    choices=["magicpoint", "photometric"],
                    help="photometric = textured surfaces + photometric "
                         "jitter + homographic-adaptation self-labeling "
                         "(VERDICT r4 item 8)")
    ap.add_argument("--ha-every", type=int, default=4,
                    help="photometric stage: every Nth batch self-labels "
                         "via homographic adaptation (0 disables)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from omniswarm_tpu.models.superpoint import load_flax_npz, save_flax_npz
    from omniswarm_tpu.models.train_superpoint import (
        detection_metrics,
        make_batch_textured,
        matching_metrics,
        render_textured,
        train_descriptors,
        train_detector,
    )

    photo = args.stage == "photometric"
    batch_fn = make_batch_textured if photo else None
    render_fn = render_textured if photo else None

    params = None
    if args.resume:
        loaded = load_flax_npz(args.resume)
        params = loaded["net"]
    if args.steps > 0:
        params, history = train_detector(
            steps=args.steps, batch=args.batch, h=args.height, w=args.width,
            lr=args.lr, log_every=max(args.steps // 20, 1), params=params,
            batch_fn=batch_fn, ha_every=args.ha_every if photo else 0)
        for it, loss in history:
            print(f"step {it:5d} loss {loss:.4f}")
    if args.descriptor_steps > 0:
        params, history = train_descriptors(
            steps=args.descriptor_steps, batch=args.batch, h=args.height,
            w=args.width, lr=args.lr, params=params,
            log_every=max(args.descriptor_steps // 20, 1),
            batch_fn=batch_fn, render_fn=render_fn)
        for it, loss, ld, lc in history:
            print(f"step {it:5d} loss {loss:.4f} (desc {ld:.4f} det {lc:.4f})")
        mm = matching_metrics(params, n_eval=16,
                              h=args.height, w=args.width,
                              render_fn=render_fn)
        print(f"eval: match precision {mm['match_precision']:.3f} "
              f"over {mm['matches']} matches")
    m = detection_metrics(params, n_eval=32)
    print(f"eval: precision {m['precision']:.3f} recall {m['recall']:.3f}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_flax_npz(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
