#!/usr/bin/env python
"""Convert SuperPoint PyTorch weights (+ PCA CSVs) to the npz checkpoint
consumed by omniswarm_tpu.models.superpoint.load_params_npz.

The reference exports its SuperPoint from a .pth via ONNX→TensorRT
(swarm_loop/superpoint.ipynb) and projects descriptors 256→64 with PCA
components stored as CSV (models/components_.csv + mean_.csv, loaded at
superpoint_tensorrt.cpp:14-45). This tool takes the same artifacts:

    python tools/convert_superpoint.py \
        --pth superpoint_v1.pth \
        --pca-components components_.csv --pca-mean mean_.csv \
        --out superpoint.npz

State-dict key convention: the standard SuperPointNet layout
(conv1a..conv4b, convPa/convPb, convDa/convDb) with .weight (OIHW) and
.bias tensors.
"""
from __future__ import annotations

import argparse

import numpy as np

LAYERS = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
          "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]


def convert(pth_path: str, out_path: str, pca_components: str | None = None,
            pca_mean: str | None = None) -> None:
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = {}
    for layer in LAYERS:
        w = state[f"{layer}.weight"].numpy()
        b = state[f"{layer}.bias"].numpy()
        out[f"{layer}.weight"] = w.astype(np.float32)
        out[f"{layer}.bias"] = b.astype(np.float32)
    if pca_components:
        comps = np.genfromtxt(pca_components, delimiter=",")
        comps = comps.reshape(comps.shape[0], -1).astype(np.float32)
        out["pca_components"] = comps
        if pca_mean:
            mean = np.genfromtxt(pca_mean, delimiter=",").reshape(-1)
            out["pca_mean"] = mean.astype(np.float32)
        else:
            out["pca_mean"] = np.zeros(comps.shape[1], np.float32)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: {sorted(out)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--pca-components")
    ap.add_argument("--pca-mean")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.pth, args.out, args.pca_components, args.pca_mean)


if __name__ == "__main__":
    main()
