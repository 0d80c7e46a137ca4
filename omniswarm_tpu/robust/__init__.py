from omniswarm_tpu.robust.pcm import (  # noqa: F401
    LoopSet,
    PCMResult,
    consistency_matrix,
    loopset_from_measurements,
    pcm_filter,
)
