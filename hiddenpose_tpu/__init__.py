"""hiddenpose_tpu — a TPU-native NLOS 3D human pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Hagtaril/HiddenPose: transient NLOS measurements → Light-Cone-Transform
reconstruction → 3D CNN/transformer pose networks → 3D heatmaps →
soft-argmax joints, with data-parallel training over `jax.sharding` meshes.
"""

__version__ = "0.1.0"

from hiddenpose_tpu.config import Config, default_config, t128_config  # noqa: F401
