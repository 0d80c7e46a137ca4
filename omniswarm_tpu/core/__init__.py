from omniswarm_tpu.core import geometry, trajectory  # noqa: F401
