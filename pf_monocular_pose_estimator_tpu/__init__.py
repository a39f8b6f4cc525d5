"""pf_monocular_pose_estimator_tpu — TPU-native LED-marker 6-DoF pose tracking.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ObiRobotics/pf_monocular_pose_estimator (PF-MPE): LED blob detection,
combinatorial P3P initialisation, particle-filter tracking and Gauss-Newton
pose refinement — expressed as fixed-shape, functionally-pure, batched array
programs that scale the particle bank across a TPU mesh.

Layer map (cf. /root/repo/SURVEY.md §7):
  geometry/  SE(3) exp/log, pinhole camera + plumb-bob distortion, Umeyama
  solvers/   batched Ferrari quartic + Kneip P3P, combinatoric index tables
  ops/       image kernels: threshold+blur, connected components, moments
  pf/        particle filter: propagate, weight, resample, refine
  tracker/   per-frame state machine: init / track / recover, multi-target
  parallel/  mesh sharding of the particle bank, distributed resampling
  io/        marker YAML, camera calib, synthetic sequences, metrics, viz
  utils/     config, fail-flag taxonomy, checkpointing
"""

__version__ = "0.1.0"
