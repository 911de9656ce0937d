"""DiffSensei-TPU: a TPU-native (JAX/XLA/Pallas/pjit) manga panel generation framework.

Re-implements the capabilities of jianzongwu/DiffSensei (arXiv:2412.07589) with a
TPU-first design: functional JAX models, static-shape bucketed compilation, Pallas
kernels for the attention hot path, and jax.sharding meshes for scale-out.
"""

__version__ = "0.1.0"
