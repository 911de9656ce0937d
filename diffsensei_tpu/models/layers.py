"""Shared neural building blocks for the diffusion stack (UNet + VAE).

TPU-first conventions used throughout the model zoo:

* **NHWC layout** — TPU convolutions natively tile [N, H, W, C] with the channel
  axis on the 128-lane dimension; torch's NCHW would force transposes.
* **bf16 compute / fp32 params** via the ``dtype``/``param_dtype`` pair on every
  module (see ``core/dtypes.py``); matmuls accumulate in fp32.
* **Static shapes only** — spatial dims come from ``x.shape`` under jit, all loops
  are Python-unrolled over static config, so each (bucket, batch) pair compiles once.

Functional equivalents of diffusers blocks the reference inherits through
``UNet2DConditionModel`` / ``AutoencoderKL`` (reference ``src/models/unet.py:21,43``):
ResnetBlock2D, Downsample2D/Upsample2D, GEGLU feed-forward, and the sinusoidal /
MLP timestep embeddings.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.ops.conv3x3 import conv3x3
from diffsensei_tpu.ops.groupnorm import groupnorm_silu

Dtype = Any


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding=1)`` that routes
    wide-channel convs through the shifted-matmul path (``ops/conv3x3.py``;
    measured faster than XLA's conv on v5e for Cin >= ~900). Identical param
    names/shapes to ``nn.Conv``, so checkpoints and ports are unaffected."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        y = conv3x3(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(y.dtype)


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm+SiLU through the fused Pallas kernel (``ops/groupnorm.py``);
    param names match ``nn.GroupNorm`` so ports/checkpoints are unaffected."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        return groupnorm_silu(x.astype(self.dtype), scale, bias,
                              self.num_groups, self.epsilon)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics).

    Args:
      timesteps: [...] float or int tensor of timestep values.
      dim: embedding dimension (must be even).

    Returns [..., dim] float32 embeddings. SDXL uses flip_sin_to_cos=True,
    downscale_freq_shift=0 for both the time and the micro-conditioning ids.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting a sinusoidal embedding to the UNet width."""

    out_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 residual block with additive time conditioning.

    Matches the diffusers ResnetBlock2D the reference UNet is assembled from;
    XLA fuses the norm+SiLU elementwise chain into the convolution's input.
    """

    out_channels: int
    norm_num_groups: int = 32
    use_time_emb: bool = True
    # diffusers: UNet resnets get norm_eps=1e-5 (UNet2DConditionModel
    # default), VAE resnets keep ResnetBlock2D's default 1e-6
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None):
        in_channels = x.shape[-1]
        h = FusedGroupNormSiLU(self.norm_num_groups, self.norm_eps,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype, name="norm1")(x)
        h = Conv3x3(self.out_channels, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = FusedGroupNormSiLU(self.norm_num_groups, self.norm_eps,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype, name="norm2")(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsampling."""

    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor x2 (or to an explicit ``output_size``) then 3x3 conv.

    ``output_size`` mirrors diffusers' ``forward_upsample_size`` path: odd
    skip-connection sizes (any multiple-of-8 panel edge is legal, reference
    pipeline_diffsensei.py:208-210) need the upsample to land exactly on the
    skip's (h, w). Index math matches torch ``F.interpolate(mode="nearest")``:
    ``src = floor(dst * in/out)``.
    """

    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 output_size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        oh, ow = output_size if output_size is not None else (2 * h, 2 * w)
        if (oh, ow) == (2 * h, 2 * w):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            x = jnp.take(x, (jnp.arange(oh) * h) // oh, axis=1)
            x = jnp.take(x, (jnp.arange(ow) * w) // ow, axis=2)
        return Conv3x3(self.out_channels, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class GEGLUFeedForward(nn.Module):
    """Transformer FFN with GEGLU gating (diffusers ``FeedForward`` default).

    ``quantized=True`` serves both projections as weight-only int8 (see
    ``models/lora.py::LoRADense``) — the FFN kernels are the largest single
    share of the UNet's transformer bytes."""

    dim: int
    mult: int = 4
    quantized: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from diffsensei_tpu.models.lora import LoRADense

        inner = self.dim * self.mult
        dense = lambda feats, name: (
            LoRADense(feats, quantized=True, dtype=self.dtype,
                      param_dtype=self.param_dtype, name=name)
            if self.quantized else
            nn.Dense(feats, dtype=self.dtype, param_dtype=self.param_dtype,
                     name=name))
        proj = dense(inner * 2, "proj_in")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        # diffusers GEGLU uses F.gelu (exact erf). In fp32 we match it exactly
        # (parity oracles); in bf16 the tanh approximation's error (<=5e-4) is
        # below bf16 resolution and measures ~10% faster on v5e (erf 5.69 ms
        # vs tanh 5.19 ms on the fused [2,4096,2560]+matmul shape, 2026-08).
        exact = jnp.dtype(self.dtype) == jnp.dtype(jnp.float32)
        x = h * nn.gelu(gate, approximate=not exact)
        return dense(self.dim, "proj_out")(x)
