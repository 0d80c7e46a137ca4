from omniswarm_tpu.swarm.estimator import (  # noqa: F401
    DetRecord,
    KeyframeRecord,
    LoopRecord,
    SwarmEstimator,
)
