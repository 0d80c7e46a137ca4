"""Secondary benchmark: visual front-end throughput on one chip.

Counterpart of the reference's loop_tensorrt_test.cpp (1000-iteration
SuperPoint + NetVLAD latency loop on TX2/RTX3080 TRT engines). Measures the
full keyframe feature path at the reference's fisheye resolution
(400x208, loop_defines.h / nodelet-sfisheye.launch:45-46): SuperPoint
forward + NMS + top-K + descriptor sampling + PCA, and MobileNetVLAD global
descriptors, batched over the 4 fisheye directions like one omnidirectional
keyframe.

Prints one JSON line (informational; the driver's headline metric is
bench.py's solver throughput).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from omniswarm_tpu.models.netvlad import GlobalDescriptorExtractor
    from omniswarm_tpu.models.superpoint import SuperPointExtractor

    H, W, B = 208, 400, 4    # 4 fisheye directions per keyframe
    sp = SuperPointExtractor(height=H, width=W, max_keypoints=200)
    nv = GlobalDescriptorExtractor(height=H, width=W, out_dim=4096)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.uniform(size=(B, H, W, 1)).astype(np.float32)))

    out = sp(imgs)
    jax.block_until_ready(out[0])
    gd = nv(imgs)
    jax.block_until_ready(gd)

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = sp(imgs)
        gd = nv(imgs)
    jax.block_until_ready(out[0])
    jax.block_until_ready(gd)
    dt = (time.perf_counter() - t0) / n

    views_per_s = B / dt
    # reference cadence: 0.3-1.0 keyframes/s on TX2 (max_freq)
    print(json.dumps({
        "metric": "frontend_views_per_s_400x208_sp_plus_netvlad",
        "value": round(views_per_s, 2),
        "unit": "views/s",
        "keyframes_per_s_4dir": round(views_per_s / 4, 2),
    }))


if __name__ == "__main__":
    main()
