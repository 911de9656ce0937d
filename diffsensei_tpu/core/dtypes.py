"""Dtype policy for the TPU build.

The reference runs fp16 weights on CUDA with an fp32 VAE-decode upcast
(``pipeline_diffsensei.py:339-365``). On TPU the native fast dtype is bfloat16:
params and activations are bf16 by default, accumulation in attention/matmul is
fp32 (``preferred_element_type``), and the VAE decodes in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: Any = jnp.float32     # master params (optimizer state stays fp32)
    compute_dtype: Any = jnp.bfloat16  # activations / matmul inputs
    vae_dtype: Any = jnp.float32       # VAE decode stays fp32 (overflow-prone)

    @classmethod
    def inference(cls) -> "DTypePolicy":
        # Serving casts params to bf16 to halve HBM traffic.
        return cls(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    @classmethod
    def train(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


DEFAULT_POLICY = DTypePolicy()
