"""Fused GroupNorm + SiLU for the UNet/VAE resnet blocks.

SURVEY §2.6: the reference's GroupNorm/SiLU runs inside diffusers' CUDA-backed
blocks (inherited via ``UNet2DConditionModel``, ``src/models/unet.py:21,43``).
On TPU, XLA computes GN as a stats reduction pass plus a normalize pass — two
HBM reads of the feature map. The Pallas kernel here does both in one VMEM
residency per batch row: load the [H, W, C] map once, reduce per-group
mean/variance on-chip, normalize + affine + SiLU, write once.

Dispatch: the kernel runs when the per-sample feature map fits the VMEM budget
(all SDXL UNet resnet activations at <=1024^2 in bf16 do; the VAE's 1024^2
decoder maps do not) and the backend is TPU — otherwise the jnp reference.
Training: differentiable via a custom VJP whose backward re-derives gradients
from the jnp reference (XLA), keeping the fused forward on the hot inference
path without hand-writing the GN backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def groupnorm_silu_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                       num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """jnp oracle: GroupNorm (per-sample, over H,W,C/G) then SiLU."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    norm = (xf - mean) * jax.lax.rsqrt(var + eps)
    norm = norm.reshape(b, h, w, c)
    out = norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (out * jax.nn.sigmoid(out)).astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                    eps: float):
    # Lane-friendly group stats: Mosaic cannot shape-cast the channel (lane)
    # axis into (groups, group_size), so reduce spatially to [1, C] first and
    # fold channels into groups with an indicator matmul [C, G] — then expand
    # back per channel the same way.
    x = x_ref[0].astype(jnp.float32)              # [H, W, C]
    h, w, c = x.shape
    gsz = c // num_groups
    xs = x.reshape(h * w, c)
    ind = (jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gsz ==
           jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
           ).astype(jnp.float32)                  # [C, G]

    sum_c = jnp.sum(xs, axis=0, keepdims=True)            # [1, C]
    sumsq_c = jnp.sum(xs * xs, axis=0, keepdims=True)     # [1, C]
    n = h * w * gsz
    mean_g = jnp.dot(sum_c, ind, preferred_element_type=jnp.float32) / n
    meansq_g = jnp.dot(sumsq_c, ind, preferred_element_type=jnp.float32) / n
    var_g = meansq_g - mean_g * mean_g                     # [1, G]

    mean_c = jnp.dot(mean_g, ind.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), ind.T,
                     preferred_element_type=jnp.float32)   # [1, C]
    out = (xs - mean_c) * rstd_c * scale_ref[:].astype(jnp.float32)[None] \
        + bias_ref[:].astype(jnp.float32)[None]
    out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.reshape(h, w, c).astype(o_ref.dtype)


def _fused_forward(x, scale, bias, num_groups, eps):
    b, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(x, scale, bias, num_groups, eps):
    return _fused_forward(x, scale, bias, num_groups, eps)


def _fused_fwd(x, scale, bias, num_groups, eps):
    return _fused_forward(x, scale, bias, num_groups, eps), (x, scale, bias)


def _fused_bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda a, s, b: groupnorm_silu_ref(a, s, b, num_groups, eps),
        x, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   num_groups: int, eps: float = 1e-5,
                   force_fused: Optional[bool] = None) -> jnp.ndarray:
    """Fused GN+SiLU; falls back to the jnp reference off-TPU / oversized.

    The kernel holds the fp32 upcast of one sample's [H, W, C] map plus
    temporaries in VMEM (~3x fp32 bytes); larger maps (SDXL levels 0-1 at
    1024^2) take the XLA path, where the stats+normalize pair fuses into the
    adjacent convolution reasonably well.
    """
    b, h, w, c = x.shape
    # Measured on v5e (2026-08): XLA's stats+normalize is as fast as this
    # kernel at every size that fits VMEM (both ~1ms incl. dispatch at
    # 16x16x1280; Mosaic footprint ~8x input bytes forbids larger maps), so
    # the default is the XLA path — the kernel stays available for explicit
    # use and as the fusion template for future hardware.
    per_sample = h * w * c * x.dtype.itemsize
    use = force_fused
    if use is None:
        use = False
    elif use:
        use = per_sample * 8 <= _VMEM_BUDGET_BYTES and c % num_groups == 0
    if use:
        return _fused(x, scale, bias, num_groups, eps)
    return groupnorm_silu_ref(x, scale, bias, num_groups, eps)
