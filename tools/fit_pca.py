#!/usr/bin/env python
"""Fit the 256→64 local-descriptor PCA projection.

Counterpart of the reference's pca.ipynb, which fits sklearn PCA on SuperPoint
descriptors dumped from flight data and writes models/components_.csv +
mean_.csv consumed at superpoint_tensorrt.cpp:14-45. This tool takes a .npy
of raw descriptors (N, 256), fits the projection with a plain SVD (no
sklearn dependency), and writes either CSVs (reference format) or augments a
SuperPoint .npz checkpoint in place.

    python tools/fit_pca.py --desc descs.npy --dim 64 --out-npz superpoint.npz
    python tools/fit_pca.py --desc descs.npy --dim 64 \
        --out-components components_.csv --out-mean mean_.csv
"""
from __future__ import annotations

import argparse

import numpy as np


def fit_pca(desc: np.ndarray, dim: int):
    """Returns (components (dim, C), mean (C,), explained_ratio (dim,))."""
    desc = np.asarray(desc, np.float64)
    mean = desc.mean(axis=0)
    centered = desc - mean
    # SVD of the centered data: rows of Vt are principal axes
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    var = s ** 2
    ratio = var[:dim] / var.sum()
    return vt[:dim].astype(np.float32), mean.astype(np.float32), ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--desc", required=True, help=".npy of (N, C) descriptors")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--out-components")
    ap.add_argument("--out-mean")
    ap.add_argument("--out-npz", help="add pca_components/pca_mean to an "
                                      "existing SuperPoint npz checkpoint")
    args = ap.parse_args()

    desc = np.load(args.desc)
    comps, mean, ratio = fit_pca(desc, args.dim)
    print(f"explained variance ratio (top {args.dim}): {ratio.sum():.3f}")
    if args.out_components:
        np.savetxt(args.out_components, comps, delimiter=",")
    if args.out_mean:
        np.savetxt(args.out_mean, mean[None], delimiter=",")
    if args.out_npz:
        base = dict(np.load(args.out_npz))
        # flax-npz checkpoints (models.superpoint.save_flax_npz) mark
        # non-network extras with a dunder prefix
        flax_style = any(k.count("/") for k in base)
        pfx = "__" if flax_style else ""
        base.pop("pca_components", None)
        base.pop("pca_mean", None)
        base[pfx + "pca_components"] = comps
        base[pfx + "pca_mean"] = mean
        np.savez(args.out_npz, **base)
        print(f"updated {args.out_npz}")


if __name__ == "__main__":
    main()
