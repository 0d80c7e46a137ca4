from omniswarm_tpu.utils.telemetry import GLOBAL, Telemetry  # noqa: F401
from omniswarm_tpu.utils.cgraph import graph_to_dot  # noqa: F401
