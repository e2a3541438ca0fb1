"""gens_tpu — TPU-native generalizable neural surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the full capability set of the
GenS pipeline (see /root/reference, SURVEY.md): multi-view FPN features,
cascaded global feature volumes with cross-view mean/var aggregation, 3D
U-Net regularization, NeuS-style SDF rendering with IBRNet-style blending,
multi-scale feature-metric consistency, pseudo-depth distillation, per-scene
fine-tuning, marching-cubes mesh extraction and DTU/BlendedMVS Chamfer
evaluation.

Design: functional (params are pytrees), static shapes under jit, masked
dense compute instead of boolean indexing, sharding via named device meshes
(axes: data, view), interpolation as explicit gather+lerp so JAX autodiff
composes to arbitrary order (no custom double-backward kernels needed).
"""

__version__ = "0.1.0"
