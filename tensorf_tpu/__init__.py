"""tensorf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) few-shot TensoRF framework.

Re-designed from scratch for TPU with the capabilities of the reference
PyTorch implementation (hautran7201/3D-reconstruction): factorized radiance
fields (CP / VM-split tensor decompositions), FreeNeRF-style frequency
regularization, chunked volume rendering with alpha-mask culling, and
marching-cubes mesh export.

Design stance (TPU-first, not a port):
  * functional core — models are pytrees of arrays + static config
  * fixed shapes + masked compute instead of boolean compaction
  * one jitted train step; schedule events (upsample/shrink) are segment
    boundaries that re-trace
  * channels-last (H, W, R) factor layouts so feature gathers read
    contiguous rank-vectors
  * ray-batch data parallelism over a `jax.sharding.Mesh`
"""

__version__ = "0.1.0"
