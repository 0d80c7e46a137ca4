from omniswarm_tpu.sim.simulator import (  # noqa: F401
    DetMeas,
    LoopMeas,
    SimData,
    SimParams,
    generate,
)
from omniswarm_tpu.sim.pipeline import build_graph_from_sim  # noqa: F401
