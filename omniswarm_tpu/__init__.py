"""omniswarm_tpu — TPU-native decentralized visual-inertial-UWB swarm state estimation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
HKUST-Aerial-Robotics/Omni-swarm (T-RO 2022, arXiv:2103.04131): each drone in
an aerial swarm estimates, in its own local frame, the 4-DoF (x, y, z, yaw)
trajectory of every drone, fusing VIO ego-motion, UWB inter-drone ranges,
visual drone-to-drone detections, and map-based loop closures.

Instead of the reference's ROS/Ceres/TensorRT event-driven architecture the
whole stack is batched, jit-compiled, and sharded:

- ``core``     : pose4/pose6 geometry + fixed-capacity trajectories
- ``solver``   : masked fixed-shape factor graph + Gauss-Newton/LM on the MXU
- ``robust``   : PCM outlier rejection, data-association init
- ``models``   : SuperPoint / NetVLAD feature CNNs (Flax)
- ``ops``      : matching / NMS / RANSAC / triangulation kernels
- ``parallel`` : mesh sharding, distributed Hessian assembly over collectives
- ``sim``      : measurement-level swarm simulator (port of swarm_local_sim)
- ``eval``     : ATE / RMSE metrics matching the reference's scripts/utils.py
"""

__version__ = "0.1.0"
