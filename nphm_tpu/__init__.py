"""nphm_tpu: a TPU-native framework for neural parametric head models.

Re-implements the capabilities of NPHM ("Learning Neural Parametric Head
Models", CVPR 2023) as an idiomatic JAX/XLA/Pallas stack:

- ``models``: pure-function SDF decoders (global DeepSDF aka NPM, the
  anchored local-MLP ensemble aka NPHM) and forward deformation fields.
- ``ops``: TPU kernels (fused Pallas ensemble MLP) and grid utilities.
- ``parallel``: device-mesh sharding helpers (pjit / shard_map).
- ``fitting``: latent-code inference (Broyden root finding + implicit
  function theorem gradients, jitted Adam loops).
- ``training``: auto-decoder trainers for the identity and expression
  stages, with sparse-row Adam latent optimizers and checkpointing.
- ``reconstruction``: sharded dense-grid SDF evaluation, marching cubes
  (native C++ host library), mesh deformation.
- ``evaluation``: point-cloud metrics (Chamfer / normal consistency /
  F-score) and render-based sampling.
- ``data``: dataset management, supervision sampling and input pipelines.
"""

__version__ = "0.1.0"
