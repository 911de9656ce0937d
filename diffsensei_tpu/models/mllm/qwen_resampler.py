"""QwenResampler: single-layer perceiver for the SEED-X agent I/O.

Capability match for ``src/models/qwen_resampler.py:87-145`` (the reference
duplicates the class verbatim in ``qwen_visual.py:95-153``; there is exactly one
here): ``grid_size**2`` learned queries, a FIXED 2-D sin-cos positional
embedding (non-trainable, added to both queries and keys, ``:131-139``), an
optional ``kv_proj`` when kv_dim != embed_dim (``:108-113``), pre-LN on q and kv,
and one standard multi-head attention (torch ``nn.MultiheadAttention``
equivalent: joint in-proj with bias + out-proj with bias).

Used as SEED-X ``input_resampler`` (64 q, 5120 dim, kv 2048) and
``output_resampler`` (64 q, 2048 dim, kv 5120), ``configs/model/diffsensei.yaml:14-24``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsensei_tpu.core.config import QwenResamplerConfig
from diffsensei_tpu.ops.attention import multi_head_attention

Dtype = Any


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """[grid_size**2, embed_dim] fixed sin-cos table (reference ``:15-84``)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)          # w goes first (reference :52)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def _abs_pos(pos_embed: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Bicubic-resize the square pos grid to a new sequence length
    (reference ``get_abs_pos``, applied to the KV side)."""
    src = int(round(float(np.sqrt(pos_embed.shape[0]))))
    tgt = int(round(float(np.sqrt(target_len))))
    if src * src == pos_embed.shape[0] and tgt * tgt == target_len:
        if src == tgt:
            return pos_embed
        grid = pos_embed.reshape(src, src, -1)
        grid = jax.image.resize(grid, (tgt, tgt, grid.shape[-1]),
                                method="bicubic")
        return grid.reshape(tgt * tgt, -1)
    # non-square target: tile/truncate (degenerate case the reference
    # never hits with its 64-token streams)
    reps = -(-target_len // pos_embed.shape[0])
    return jnp.tile(pos_embed, (reps, 1))[:target_len]


class QwenResampler(nn.Module):
    config: QwenResamplerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, S, kv_dim] → [B, grid_size**2, embed_dim]."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, s, _ = x.shape
        dim, heads = cfg.embed_dim, cfg.num_heads
        nq = cfg.num_queries

        pos = jnp.asarray(get_2d_sincos_pos_embed(dim, cfg.grid_size))
        query = self.param("query", nn.initializers.normal(0.02),
                           (nq, dim), self.param_dtype)

        if cfg.kv_dim is not None and cfg.kv_dim != dim:
            x = nn.Dense(dim, use_bias=False, name="kv_proj", **kw)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_kv", **kw)(x)
        q = nn.LayerNorm(epsilon=1e-5, name="ln_q", **kw)(
            query.astype(self.dtype))

        q = q[None] + _abs_pos(pos, nq)[None].astype(self.dtype)   # [1, nq, dim]
        q = jnp.broadcast_to(q, (b, nq, dim))
        k = x + _abs_pos(pos, s)[None].astype(self.dtype)          # [B, S, dim]
        v = x

        # torch nn.MultiheadAttention: joint in_proj (bias) + out_proj (bias)
        dense = lambda name: nn.Dense(dim, name=name, **kw)
        qh = dense("q_in_proj")(q).reshape(b, nq, heads, -1).transpose(0, 2, 1, 3)
        kh = dense("k_in_proj")(k).reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
        vh = dense("v_in_proj")(v).reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
        o = multi_head_attention(qh, kh, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, nq, dim)
        return dense("out_proj")(o)
