"""Character-image encoders: CLIP ViT-H/14 and Magi ViTMAE.

The reference feeds each character crop through two frozen encoders
(``src/pipelines/pipeline_diffsensei.py:125-128``, ``scripts/train/train.py:356-367``):

* **CLIP ViT-H** (IP-Adapter image encoder): the **penultimate** hidden state's
  patch tokens, ``image_encoder(...).hidden_states[-2]`` → [B, 257, 1280];
* **Magi ViTMAE** (manga-domain encoder): the final **CLS** feature,
  ``magi_image_encoder(...).last_hidden_state[:, 0]`` → [B, 768].

One implementation covers both via ``VisionEncoderConfig``: conv patchify, CLS
token, learned positional embeddings, pre-LN transformer. CLIP additionally has an
embedding-LayerNorm before the blocks (``use_pre_layernorm``). Character batches are
[B * max_num_ips (* num_sources)] of 224² crops — large dense batched matmuls that
map straight onto the MXU; no custom kernels needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import VisionEncoderConfig
from diffsensei_tpu.ops.attention import multi_head_attention

Dtype = Any


class ViTLayer(nn.Module):
    config: VisionEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dim, heads = cfg.hidden_size, cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="layer_norm1", **kw)(x)
        dense = lambda name: nn.Dense(dim, name=name, **kw)
        q = dense("q_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        k = dense("k_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        v = dense("v_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v)
        x = x + dense("out_proj")(o.transpose(0, 2, 1, 3).reshape(h.shape))

        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="layer_norm2", **kw)(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **kw)(h)
        h = nn.gelu(h, approximate=False)  # HF ViT/CLIP gelu = exact erf
        h = nn.Dense(dim, name="fc2", **kw)(h)
        return x + h


class VisionTransformer(nn.Module):
    """Returns (penultimate_hidden_state, final_cls_feature).

    ``penultimate`` is ``hidden_states[-2]`` (input to the last block), the CLIP
    feature the Resampler consumes; ``final_cls`` is the post-LN CLS token, the
    Magi feature. Callers take whichever stream their encoder provides.
    """

    config: VisionEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = pixel_values.shape[0]
        # pixel_values: [B, H, W, 3] NHWC
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=cfg.patch_bias,
                    name="patch_embedding", **kw)(pixel_values.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        if cfg.use_class_embedding:
            cls = self.param("class_embedding", nn.initializers.normal(0.02),
                             (cfg.hidden_size,), self.param_dtype)
            cls = jnp.broadcast_to(cls.astype(self.dtype),
                                   (b, 1, cfg.hidden_size))
            x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.hidden_size), self.param_dtype)
        x = x + pos[None].astype(self.dtype)
        if cfg.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=cfg.norm_eps, name="pre_layernorm", **kw)(x)

        penultimate = x
        for i in range(cfg.num_layers):
            penultimate = x
            x = ViTLayer(cfg, name=f"layers_{i}", **kw)(x)

        final = nn.LayerNorm(epsilon=cfg.norm_eps, name="post_layernorm", **kw)(x)
        return penultimate, final[:, 0]
