"""GSASR-TPU: a TPU-native (JAX/XLA/Pallas) framework for arbitrary-scale
super-resolution with 2D Gaussian Splatting.

Re-implements the capabilities of the GSASR reference (ICCV 2025,
arXiv 2501.06838) with a TPU-first design:

- ``gsasr_tpu.ops``     — the 2D Gaussian rasterizer (Pallas TPU kernels with a
  custom VJP, plus a pure-JAX dense reference implementation).
- ``gsasr_tpu.rendering`` — activation / unit-conversion orchestration layer.
- ``gsasr_tpu.models``  — encoders (EDSR/RDN/SwinIR/HAT) and the Fea2GS
  decoders as flax modules.
- ``gsasr_tpu.data``    — MATLAB-faithful bicubic resize + continuous-scale
  training pipeline.
- ``gsasr_tpu.train``   — data-parallel trainer (shard_map over a device mesh),
  EMA, schedules, losses.
- ``gsasr_tpu.parallel`` — mesh/sharding helpers.
"""

__version__ = "0.1.0"
