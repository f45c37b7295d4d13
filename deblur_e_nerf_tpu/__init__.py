"""Deblur e-NeRF TPU — a TPU-native (JAX / XLA / Pallas / pjit) framework for
blur-minimal NeRF reconstruction directly from event-camera streams.

This is a from-scratch TPU-first re-design with the capabilities of the
reference CUDA/PyTorch implementation (wengflow/deblur-e-nerf): it models the
full event-generation physics — learnable contrast thresholds, refractory
period, and a 4th-order pixel-bandwidth low-pass filter — and supervises an
instant-NGP-style radiance field through log-intensity differences along a
continuous camera trajectory.

Architecture notes (TPU-first, not a port):
  - The rendering hot path (hash encoding, radiance MLPs, occupancy-gated ray
    marching with flat sample compaction, masked segment compositing) is
    static-shaped XLA + Pallas; there is no nerfacc/tiny-cuda-nn analog of
    variable-length packed tensors.
  - Data parallelism is a `jax.sharding.Mesh` + jit-compiled collectives over
    ICI, not NCCL/DDP.
  - Timestamps stay in int64 nanoseconds end-to-end; interval derivations are
    float64 (emulated but cheap at batch scale), while all field/render math
    is float32/bfloat16.
"""

import jax

# Timestamp math requires 64-bit precision (int64 ns, float64 intervals).
# All field/render code uses explicit float32 dtypes, so enabling x64 here
# does not silently promote the hot path.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
