from omniswarm_tpu.ops import (  # noqa: F401
    camera,
    keypoints,
    matching,
    placedb,
    ransac,
    triangulation,
)
