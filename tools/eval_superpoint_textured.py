"""Pin SuperPoint checkpoint quality on TEXTURED imagery -> SP_EVAL_r04.json.

VERDICT r3 item 8: the existing pinned metric (test_models.py) evaluates
viewpoint-change matching on flat line-art; this evaluates
matched-keypoint precision under 0.5 rad viewpoint + photometric jitter
on textured surfaces (render_textured) for each given checkpoint.

Usage: python tools/eval_superpoint_textured.py \
         --ckpt magicpoint=weights/superpoint_synthetic.npz \
         --ckpt photometric=weights/superpoint_photometric.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", action="append", required=True,
                    help="name=path.npz (repeatable)")
    ap.add_argument("--n-eval", type=int, default=24)
    ap.add_argument("--out", default="SP_EVAL_r04.json")
    args = ap.parse_args()

    from omniswarm_tpu.models.superpoint import load_flax_npz
    from omniswarm_tpu.models.train_superpoint import (
        matching_metrics, render_textured)

    wdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "omniswarm_tpu", "models")
    results = {}
    for spec in args.ckpt:
        name, path = spec.split("=", 1)
        if not os.path.exists(path):
            path = os.path.join(wdir, path)
        params = load_flax_npz(path)
        # 0.5 rad viewpoint + zoom + the photometric jitter baked into
        # render_textured / make_warped_pairs brightness+noise
        m = matching_metrics(params, n_eval=args.n_eval, max_rot=0.5,
                             max_shift=12.0, scale=(0.85, 1.2),
                             render_fn=render_textured)
        flat = matching_metrics(params, n_eval=args.n_eval, max_rot=0.5,
                                max_shift=12.0, scale=(0.85, 1.2))
        results[name] = {
            "textured_match_precision": round(m["match_precision"], 4),
            "textured_matches": m["matches"],
            "flat_match_precision": round(flat["match_precision"], 4),
            "flat_matches": flat["matches"],
        }
        print(f"[sp-eval] {name}: textured {m['match_precision']:.3f} "
              f"({m['matches']} matches), flat "
              f"{flat['match_precision']:.3f} ({flat['matches']})",
              flush=True)

    out = {
        "description": "SuperPoint matched-keypoint precision under "
                       "0.5 rad viewpoint + zoom + photometric jitter, "
                       "on textured-surface vs flat line-art imagery",
        "checkpoints": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
