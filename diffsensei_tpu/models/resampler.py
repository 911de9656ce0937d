"""Dual-stream Perceiver Resampler: character features → IP tokens.

Capability match for the reference ``Resampler`` (``src/models/resampler.py:79``,
hyper-params ``configs/model/diffsensei.yaml:7-12``): maps each character's CLIP
patch features (``[257, 1280]``, penultimate hidden state) plus its Magi ViTMAE CLS
feature (``[768]``) to ``num_queries=16`` vision tokens at the UNet's
``cross_attention_dim=2048``, and prepends a learned block of ``num_dummy_tokens``
background tokens.

Structure (reference lines cited per piece):

* ``proj_in`` (CLIP→dim) and ``proj_in_magi`` (Magi→dim), ``resampler.py:100-101``;
* the Magi token joins the CLIP sequence as one extra KV token (``:124-126``);
* ``depth`` Perceiver blocks: latents query ``[x ‖ latents]`` (``PerceiverAttention``,
  ``:47-76`` — its double-sqrt scaling is algebraically the standard 1/sqrt(d_head)
  softmax scale, implemented that way here) + LayerNorm-MLP with residuals (``:130-132``);
* learned ``latents`` (``:98``) and ``dummy_tokens`` prepended to the output
  (``:117,138-139``); ``proj_out`` + ``norm_out`` to ``output_dim`` (``:136-137``).

TPU shaping: the per-character axis folds into the batch so all characters resample
in one batched matmul sweep; output is ``[B, num_dummy + max_ips*num_queries, 2048]``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import ResamplerConfig
from diffsensei_tpu.ops.attention import multi_head_attention

Dtype = Any


class PerceiverAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        dim = latents.shape[-1]
        inner = self.heads * self.dim_head
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", **kw)(x)
        lat = nn.LayerNorm(epsilon=1e-5, name="norm2", **kw)(latents)

        q = nn.Dense(inner, use_bias=False, name="to_q", **kw)(lat)
        kv_input = jnp.concatenate([x, lat], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv", **kw)(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        o = multi_head_attention(heads_first(q), heads_first(k), heads_first(v))
        b, h, s, d = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(dim, use_bias=False, name="to_out", **kw)(o)


class ResamplerFFN(nn.Module):
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", **kw)(x)
        x = nn.Dense(dim * self.mult, use_bias=False, name="fc1", **kw)(x)
        # torch nn.GELU default is the exact erf form (reference resampler.py:16)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(dim, use_bias=False, name="fc2", **kw)(x)


class Resampler(nn.Module):
    """Per-character Perceiver resampling + dummy-token block.

    Call with ``clip_embeds [B, max_ips, P, embedding_dim]`` and
    ``magi_embeds [B, max_ips, magi_embedding_dim]``; returns
    ``[B, num_dummy_tokens + max_ips*num_queries, output_dim]``.
    """

    config: ResamplerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_embeds: jnp.ndarray,
                 magi_embeds: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n_ips, n_patch, _ = clip_embeds.shape

        x = clip_embeds.reshape(b * n_ips, n_patch, -1).astype(self.dtype)
        x = nn.Dense(cfg.dim, name="proj_in", **kw)(x)
        magi = magi_embeds.reshape(b * n_ips, 1, -1).astype(self.dtype)
        magi = nn.Dense(cfg.dim, name="proj_in_magi", **kw)(magi)
        x = jnp.concatenate([x, magi], axis=1)          # [B*I, P+1, dim]

        latents = self.param("latents", nn.initializers.normal(1.0 / cfg.dim**0.5),
                             (cfg.num_queries, cfg.dim), self.param_dtype)
        lat = jnp.broadcast_to(latents.astype(self.dtype)[None],
                               (b * n_ips, cfg.num_queries, cfg.dim))

        for i in range(cfg.depth):
            lat = lat + PerceiverAttention(cfg.heads, cfg.dim_head,
                                           name=f"layers_{i}_attn", **kw)(x, lat)
            lat = lat + ResamplerFFN(cfg.ff_mult,
                                     name=f"layers_{i}_ff", **kw)(lat)

        out = nn.Dense(cfg.output_dim, name="proj_out", **kw)(lat)
        out = nn.LayerNorm(epsilon=1e-5, name="norm_out", **kw)(out)
        out = out.reshape(b, n_ips * cfg.num_queries, cfg.output_dim)

        dummy = self.param("dummy_tokens", nn.initializers.normal(0.02),
                           (cfg.num_dummy_tokens, cfg.output_dim),
                           self.param_dtype)
        dummy = jnp.broadcast_to(dummy.astype(out.dtype)[None],
                                 (b, cfg.num_dummy_tokens, cfg.output_dim))
        return jnp.concatenate([dummy, out], axis=1)
