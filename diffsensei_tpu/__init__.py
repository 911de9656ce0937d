"""DiffSensei-TPU: a TPU-native (JAX/XLA/Pallas/pjit) manga panel generation framework.

Re-implements the capabilities of jianzongwu/DiffSensei (arXiv:2412.07589) with a
TPU-first design: functional JAX models, static-shape bucketed compilation, Pallas
kernels for the attention hot path, and jax.sharding meshes for scale-out.

Main entry points:
  * inference  — ``diffsensei_tpu.pipelines.DiffSenseiPipeline`` /
    ``diffsensei_tpu.serve.api.DiffSenseiServer``
  * training   — ``python -m diffsensei_tpu.train.cli --config <yaml>``
  * serving UI — ``diffsensei_tpu.serve.gradio_demo.build_demo`` or
    ``python -m diffsensei_tpu.serve.cli``
  * weights    — ``diffsensei_tpu.utils.port_torch`` (PyTorch → JAX)
"""

__version__ = "0.1.0"
