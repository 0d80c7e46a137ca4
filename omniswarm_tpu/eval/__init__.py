from omniswarm_tpu.eval.metrics import (  # noqa: F401
    align_first_pose,
    align_yaw_translation,
    ate_pos,
    mean_relative_ate,
    relative_ate,
    rmse,
    yaw_rmse,
)
