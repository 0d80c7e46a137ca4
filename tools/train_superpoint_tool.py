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
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from omniswarm_tpu.models.superpoint import save_flax_npz
    from omniswarm_tpu.models.train_superpoint import (
        detection_metrics,
        train_detector,
    )

    params, history = train_detector(
        steps=args.steps, batch=args.batch, h=args.height, w=args.width,
        lr=args.lr, log_every=max(args.steps // 20, 1))
    for it, loss in history:
        print(f"step {it:5d} loss {loss:.4f}")
    m = detection_metrics(params, n_eval=32)
    print(f"eval: precision {m['precision']:.3f} recall {m['recall']:.3f}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_flax_npz(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
