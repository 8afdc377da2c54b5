"""aa_rmvsnet_tpu — a TPU-native dense multi-view stereo framework.

A from-scratch JAX / XLA / Pallas implementation of the AA-RMVSNet
capability surface (multi-scale deformable feature extraction, plane-sweep
variance cost volumes with inter-view adaptive aggregation, recurrent
ConvLSTM cost regularization along the depth-hypothesis axis, winner-take-all
depth regression, evidential uncertainty, consistency filtering and
point-cloud fusion), designed TPU-first:

- hot paths are batched XLA ops + Pallas kernels (MXU-friendly NHWC layout),
- the depth-hypothesis sweep is a ``lax.scan`` with O(1) activation memory
  at inference (online winner-take-all / online softmax),
- scaling is a ``jax.sharding.Mesh`` with GSPMD-inserted collectives
  (data-parallel batch axis + spatial partitioning with automatic halo
  exchange for convolutions), not hand-written NCCL.

Subpackages
-----------
core      CPU-pure geometry + I/O foundations (PFM, cameras, samplers, PLY)
ops       JAX ops and Pallas kernels (bilinear sampling, homography warp,
          cost-volume build, deformable conv sampling)
models    flax.linen network modules + torch-checkpoint converter
data      host-side dataset pipelines (DTU train, generic eval, padded TnT)
parallel  mesh construction and sharding rules
pipeline  train / infer / fuse drivers
utils     metrics, config, logging
"""

__version__ = "0.1.0"
