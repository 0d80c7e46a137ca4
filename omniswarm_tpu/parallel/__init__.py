from omniswarm_tpu.parallel.sharded_solver import (  # noqa: F401
    graph_in_specs,
    make_mesh,
    shard_graph_factors,
    sharded_lm_solve,
)
