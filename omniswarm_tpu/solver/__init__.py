from omniswarm_tpu.solver import factors, graph, gauss_newton  # noqa: F401
from omniswarm_tpu.solver.gauss_newton import (  # noqa: F401
    SolveResult,
    lm_solve,
    lm_solve_multi_init,
    total_cost,
)
from omniswarm_tpu.solver.graph import (  # noqa: F401
    FactorGraph,
    GraphBuilder,
    diag_sqrt_info,
    empty_graph,
    sqrt_info_from_cov4,
)
