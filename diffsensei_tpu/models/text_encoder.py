"""Dual CLIP text encoders for SDXL prompt conditioning.

The reference inherits prompt encoding from ``StableDiffusionXLPipeline.encode_prompt``
(two transformers: CLIP-L/14 and OpenCLIP-bigG/14, called at
``src/pipelines/pipeline_diffsensei.py:232-245``). SDXL consumes, per encoder, the
**penultimate** hidden state (768 + 1280 = 2048 channels concatenated) plus the
bigG **pooled/projected** embedding for the additive micro-conditioning.

Both encoders share this implementation (``TextEncoderConfig.clip_l()`` /
``.clip_bigg()``): causal pre-LN transformer, quick-GELU or GELU MLP, learned
positional embeddings, EOS-token pooling. Sequence length is a fixed 77, so this is
a single static-shape forward — no Pallas needed (XLA fuses a 77-token encoder fine).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import TextEncoderConfig
from diffsensei_tpu.ops.attention import multi_head_attention

Dtype = Any


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    # HF "gelu" is the exact erf form
    return lambda x: nn.gelu(x, approximate=False)


class CLIPEncoderLayer(nn.Module):
    config: TextEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1", **kw)(x)
        heads = cfg.num_heads
        dim = cfg.hidden_size
        dense = lambda name: nn.Dense(dim, name=name, **kw)
        q = dense("q_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        k = dense("k_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        v = dense("v_proj")(h).reshape(*h.shape[:2], heads, -1).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, bias=attn_bias)
        o = o.transpose(0, 2, 1, 3).reshape(h.shape)
        x = x + dense("out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2", **kw)(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **kw)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(dim, name="fc2", **kw)(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns (penultimate_hidden_state, pooled_embedding).

    Pooling follows CLIP: the final-LN hidden state at each sequence's **last**
    token (SDXL tokenizers pad with EOS, so argmax-of-eos == last real token;
    we take the position of the highest token id, matching HF's
    ``input_ids.argmax(-1)`` for CLIP vocab where EOS is the max id), then the
    optional text projection (bigG only) for the SDXL add-embeds.
    """

    config: TextEncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding",
                       param_dtype=self.param_dtype, dtype=self.dtype)(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         self.param_dtype)
        x = tok + pos[None, :s].astype(self.dtype)

        causal = jnp.where(
            jnp.arange(s)[:, None] >= jnp.arange(s)[None, :], 0.0, -1e9
        ).astype(jnp.float32)[None, None]

        penultimate = x
        for i in range(cfg.num_layers):
            penultimate = x
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}", **kw)(x, causal)
        # SDXL consumes hidden_states[-2]: the input of the final layer.
        penultimate = x if cfg.num_layers == 0 else penultimate

        final = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm", **kw)(x)
        eos_pos = jnp.argmax(input_ids, axis=-1)
        pooled = final[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              name="text_projection", **kw)(pooled)
        return penultimate, pooled
