"""Linear IP-Adapter projections (non-Perceiver variant).

Capability match for ``src/models/projection.py:4,28``. The released DiffSensei
checkpoints use the Perceiver ``Resampler`` (``ip_adapter_plus: true``), but the
training code supports a plain linear projection path
(``configs/train/diffsensei/t2i.yaml:10``, ``scripts/train/train.py:357-360``):

* ``ImageProjModel``: pooled CLIP embedding → ``num_tokens * cross_dim`` linear →
  reshape → LayerNorm.
* ``ImageProjDummyModel``: adds the Magi CLS branch (summed into the CLIP stream,
  not concatenated) and a learned dummy-token block, mirroring the Resampler's
  output layout ``[dummy ‖ per-char tokens]``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ImageProjModel(nn.Module):
    cross_attention_dim: int = 2048
    num_tokens: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        """[B, embed_dim] pooled CLIP embeds → [B, num_tokens, cross_dim]."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.cross_attention_dim * self.num_tokens,
                     name="proj", **kw)(image_embeds)
        x = x.reshape(image_embeds.shape[0], self.num_tokens,
                      self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, name="norm", **kw)(x)


class ImageProjDummyModel(nn.Module):
    """Per-character linear projection + Magi branch + dummy tokens.

    Call with ``clip_embeds [B, max_ips, embed_dim]`` (pooled) and
    ``magi_embeds [B, max_ips, magi_dim]``; returns
    ``[B, num_dummy_tokens + max_ips*num_tokens, cross_dim]``.
    """

    cross_attention_dim: int = 2048
    num_tokens: int = 16
    num_dummy_tokens: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_embeds: jnp.ndarray,
                 magi_embeds: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n_ips, _ = clip_embeds.shape
        width = self.cross_attention_dim * self.num_tokens
        # the reference normalizes each branch separately with the SAME norm
        # module, then sums (projection.py:55-63) — LayerNorm is nonlinear, so
        # the order matters for parity
        norm = nn.LayerNorm(epsilon=1e-5, name="norm", **kw)
        x = nn.Dense(width, name="proj", **kw)(clip_embeds)
        x = norm(x.reshape(b, n_ips * self.num_tokens, self.cross_attention_dim))
        m = nn.Dense(width, name="proj_magi", **kw)(magi_embeds)
        x = x + norm(m.reshape(b, n_ips * self.num_tokens,
                               self.cross_attention_dim))

        dummy = self.param("dummy_tokens", nn.initializers.normal(0.02),
                           (self.num_dummy_tokens, self.cross_attention_dim),
                           self.param_dtype)
        dummy = jnp.broadcast_to(dummy.astype(x.dtype)[None],
                                 (b, self.num_dummy_tokens,
                                  self.cross_attention_dim))
        return jnp.concatenate([dummy, x], axis=1)
