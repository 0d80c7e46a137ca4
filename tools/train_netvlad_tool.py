#!/usr/bin/env python
"""Train MobileNetVLAD on synthetic places and save a checkpoint.

Runs on whatever backend jax picks (the real TPU under axon); the saved
checkpoint loads via models.netvlad.pretrained_global_extractor.

    python tools/train_netvlad_tool.py --steps 600 --out weights/nv.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--places", type=int, default=16)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None,
                    help="checkpoint to continue from")
    ap.add_argument("--out", required=True)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--max-rot", type=float, default=0.25)
    ap.add_argument("--noise", type=float, default=0.03)
    ap.add_argument("--scale", type=float, nargs=2, default=(1.0, 1.0))
    ap.add_argument("--cosine", action="store_true")
    ap.add_argument("--revisit", type=float, default=None,
                    help="train view pairs as revisits within this fraction "
                         "of the view size (e.g. 0.35)")
    ap.add_argument("--hard-eval", action="store_true",
                    help="evaluate on the hard 256-way jittered revisit "
                         "benchmark")
    ap.add_argument("--save-every", type=int, default=1000,
                    help="checkpoint to --out every N steps (0 disables)")
    ap.add_argument("--continue-out", action="store_true",
                    help="if --out exists, resume from it (stall-relaunch "
                         "friendly: combine with tools/run_with_retry.sh)")
    ap.add_argument("--textured", action="store_true",
                    help="textured place canvases (render_textured) — the "
                         "imagery family of the image demo's RoomWorld")
    ap.add_argument("--arch", type=int, default=1, choices=(1, 2),
                    help="encoder version for fresh training (2 = "
                         "GroupNorm'd deeper encoder); resumed checkpoints "
                         "use their stored version")
    args = ap.parse_args()

    from omniswarm_tpu.models.netvlad import (
        load_netvlad_npz,
        netvlad_meta,
        save_netvlad_npz,
    )
    from omniswarm_tpu.models.train_netvlad import (
        retrieval_metrics,
        train_netvlad,
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    resume = args.resume
    resume_path = None
    if args.continue_out:
        # full-precision sidecar keeps Adam state across stall relaunches;
        # the f16 npz stays the portable artifact. Prefer the sidecar (it
        # was written atomically together with the f16 checkpoint).
        resume_path = args.out + ".resume.npz"
        if os.path.exists(resume_path):
            print(f"resuming from {resume_path} (f32 + opt state)",
                  flush=True)
            resume = args.out if os.path.exists(args.out) else None
        elif os.path.exists(args.out):
            resume = args.out
            print(f"resuming from existing {args.out}", flush=True)
    arch = netvlad_meta(resume)["encoder_version"] if resume else args.arch
    # when the f32 sidecar exists train_netvlad overrides these params with
    # it; the f16 load only seeds arch-matched shapes for tree_unflatten
    params = load_netvlad_npz(resume) if resume else None
    params, history = train_netvlad(
        steps=args.steps, places_per_batch=args.places, pool_size=args.pool,
        lr=args.lr, seed=args.seed, params=params,
        log_every=max(args.steps // 20, 1), temperature=args.temperature,
        max_rot=args.max_rot, noise=args.noise, scale=tuple(args.scale),
        cosine=args.cosine, verbose=True, revisit_offset=args.revisit,
        save_every=args.save_every or None, save_path=args.out,
        resume_path=resume_path, encoder_version=arch,
        textured=args.textured)
    m = retrieval_metrics(params, encoder_version=arch,
                          textured=args.textured)
    print(f"eval(easy 64-way): recall@1 {m['recall_at_1']:.3f} "
          f"margin {m['mean_margin']:.3f}", flush=True)
    if args.hard_eval:
        mh = retrieval_metrics(params, n_places=256, max_rot=0.5,
                               noise=0.06, scale=(0.8, 1.25),
                               revisit_offset=0.35, encoder_version=arch,
                               textured=args.textured)
        print(f"eval(hard 256-way revisit): recall@1 "
              f"{mh['recall_at_1']:.3f} margin {mh['mean_margin']:.3f}",
              flush=True)
    save_netvlad_npz(params, args.out, encoder_version=arch)
    print(f"saved {args.out} (encoder v{arch})")


if __name__ == "__main__":
    main()
