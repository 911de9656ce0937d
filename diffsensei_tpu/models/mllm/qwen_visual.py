"""Qwen-VL-style vision tower with attention pooling (SEED-X's original ViT).

Capability match for ``src/models/vision_encoders/qwen_visual.py``:
``VisionTransformerWithAttnPool`` (``:321``) — conv patchify (``:347``),
bicubic-interpolated absolute position embeddings (``:23-39``), pre-LN
transformer blocks (``VisualAttentionBlock:238``), and an attention-pool head
that resamples the patch sequence to ``grid_size**2`` tokens via a
``QwenResampler`` (``:366-372``) followed by LayerNorm + linear projection.
A plain ``VisionTransformer`` head-less variant exists at ``:423``.

Not used by any released DiffSensei entry point (CLIP/Magi come from
transformers instead; SURVEY.md §2.1 "port priority: low/optional") — provided
for SEED-X checkpoint completeness. The standard pre-LN ViT block is shared
with ``models/vision_encoder.ViTLayer``; the attention-pool head reuses the
agent's ``QwenResampler``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsensei_tpu.core.config import QwenResamplerConfig, VisionEncoderConfig
from diffsensei_tpu.models.mllm.qwen_resampler import QwenResampler
from diffsensei_tpu.models.vision_encoder import ViTLayer

Dtype = Any


def interpolate_abs_pos(pos: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Bicubic square-grid resize of absolute pos embeddings (reference
    ``get_abs_pos``, ``qwen_visual.py:23-39``)."""
    src = int(round(float(np.sqrt(pos.shape[0]))))
    tgt = int(round(float(np.sqrt(target_len))))
    if src == tgt:
        return pos
    grid = pos.reshape(src, src, -1)
    grid = jax.image.resize(grid, (tgt, tgt, grid.shape[-1]), method="bicubic")
    return grid.reshape(tgt * tgt, -1)


class QwenVisionTransformer(nn.Module):
    """Plain head-less Qwen-VL ViT (reference ``qwen_visual.py:423-489``):
    conv patchify → interpolated abs pos → ln_pre → pre-LN blocks; returns the
    full patch sequence ``[B, grid**2, width]`` (no pooling head)."""

    config: VisionEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, name="patch_embedding",
                    **kw)(pixel_values.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (256, cfg.hidden_size), self.param_dtype)
        x = x + interpolate_abs_pos(pos.astype(self.dtype), x.shape[1])[None]
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_pre", **kw)(x)
        for i in range(cfg.num_layers):
            x = ViTLayer(cfg, name=f"layers_{i}", **kw)(x)
        return x


class VisionTransformerWithAttnPool(nn.Module):
    """[B, H, W, 3] → [B, grid_size**2, output_dim] pooled vision tokens."""

    config: VisionEncoderConfig
    pool: QwenResamplerConfig
    output_dim: int = 4096
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, name="patch_embedding",
                    **kw)(pixel_values.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches, cfg.hidden_size), self.param_dtype)
        x = x + interpolate_abs_pos(pos.astype(self.dtype), x.shape[1])[None]
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_pre", **kw)(x)

        for i in range(cfg.num_layers):
            x = ViTLayer(cfg, name=f"layers_{i}", **kw)(x)

        x = QwenResampler(self.pool, name="attn_pool", **kw)(x)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_post", **kw)(x)
        x = nn.Dense(self.output_dim, use_bias=False, name="proj", **kw)(x)
        return x
