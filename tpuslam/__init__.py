"""tpuslam — a TPU-native visual(-inertial) SLAM engine.

A from-scratch re-design of the capabilities of ORB-SLAM3 (reference:
wangyunpeng139/3_ORB_SLAM3_SelfNote, C++/g2o/OpenCV) for TPU hardware:

- Front-end (ORB pyramid extraction, FAST, rBRIEF, Hamming matching) as
  batched, fixed-shape JAX/XLA programs (Pallas kernels for the hot ops).
- Back-end (pose optimization, local/global bundle adjustment, IMU
  preintegration factors, Sim3/pose-graph) as batched Gauss-Newton /
  Levenberg-Marquardt with explicit Schur complement on landmark blocks —
  replacing g2o's dynamic sparse-graph machinery with dense, masked,
  fixed-capacity factor batches.
- Map state (Atlas / Map / KeyFrame / MapPoint pointer graph in the
  reference) as SoA array pools with validity masks, suitable for
  sharding across a `jax.sharding.Mesh`.

Design notes reference the C++ layout in /root/reference via file:line
citations so feature parity can be audited.
"""

import jax as _jax

# SLAM geometry chains thousands of small rotation/Jacobian matmuls; the
# TPU MXU's default bfloat16 matmul precision accumulates catastrophic
# drift (e.g. 400 composed 3x3 rotations lose ~0.4 rad). Force f32
# matmul arithmetic globally; hot kernels that tolerate bf16 (descriptor
# popcount matmuls are integer anyway) opt down explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from tpuslam import config  # noqa: F401,E402

__version__ = "0.1.0"
