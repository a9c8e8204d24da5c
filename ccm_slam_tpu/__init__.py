"""ccm_slam_tpu — TPU-native collaborative monocular SLAM.

A from-scratch re-design of the capabilities of CCM-SLAM
(VIS4ROB-lab/ccm_slam): up to N camera-only agents run a lightweight
visual-odometry front-end with a bounded local map and stream keyframes +
landmarks to a central server that detects loop closures and inter-map
overlaps, merges maps, and runs Sim(3) pose-graph optimization and global
bundle adjustment — all recast as pure-functional JAX programs:

* fixed-capacity SoA map arenas with validity masks (no pointers, no locks);
* batched Pallas/XLA kernels for ORB extraction and Hamming matching;
* Levenberg–Marquardt with Schur-complement landmark marginalization in
  place of g2o; interruption = checkpointing between outer iterations;
* `jax.sharding.Mesh` + collectives in place of ROS topics for the
  multi-host server.

Layout:
  utils/     Lie groups (SO3/SE3/Sim3), camera model, geometry helpers
  ops/       vision kernels: ORB, FAST, BRIEF, Hamming matching, RANSAC, BoW
  solvers/   LM core, pose-only BA, local/global BA (Schur), Sim3, pose graph
  models/    map data model: KeyFrame/MapPoint arenas, covisibility, KF database
  runtime/   tracking, local mapping, loop closing, map matching, communicator
  parallel/  device-mesh sharded GBA and multi-host orchestration
  io/        EuRoC loading, trajectory writing, ATE evaluation
"""

__version__ = "0.1.0"
