from omniswarm_tpu.ops import (  # noqa: F401
    keypoints,
    matching,
    placedb,
    ransac,
    triangulation,
)
