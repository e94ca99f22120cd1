"""dcanet_tpu — a TPU-native (JAX/XLA/Pallas) stereo-depth framework.

Re-implements the full capability surface of DCANet ("Cost Volume Aggregation
in Stereo Matching Revisited", TIP 2024; reference: cocowy1/
Cost-Volume-Aggregation-in-Stereo-Matching-Revisited) as an idiomatic
TPU-first framework:

- grouped-correlation + concat cost volumes (`ops.cost_volume`, Pallas kernel
  in `kernels.gwc`)
- the DCA / CVA disparity-classification module with semantic-level context
  pooling re-derived as dense one-hot linear algebra (`ops.slc`, `nn.cva`)
- shallow 3D-CNN aggregation, soft-argmin regression, RAFT-style convex
  upsampling (`nn`, `ops.regression`, `ops.upsample`)
- stereo focal loss + multi-scale smooth-L1 (`losses`)
- SPMD data-parallel + disparity-axis-sharded execution over a
  `jax.sharding.Mesh` (`parallel`)

Layouts are channel-last throughout: images/features `(B, H, W, C)`, cost
volumes `(B, D, H, W, C)`, probability volumes `(B, D, H, W)`, disparity maps
`(B, H, W)`.
"""

__version__ = "0.1.0"
