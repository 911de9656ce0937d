"""Attention dispatcher: Pallas flash kernel on TPU hot paths, XLA elsewhere.

The decision mirrors where the reference leaned on fused CUDA attention: long
spatial self-attention in the UNet (seq up to 16k tokens at 2048^2 panels) and
causal LLaMA attention go to the Pallas kernel; short-key cross-attention (77 text
tokens, 80 IP tokens, perceiver latents) is fastest as a plain XLA einsum-softmax,
which XLA fuses on its own.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from diffsensei_tpu.ops.flash_attention import flash_attention

# Below this key length a blocked kernel has nothing to block; XLA wins.
_FLASH_MIN_KV = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def attention_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, causal: bool = False,
                  sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Unblocked XLA attention (also the parity oracle for the Pallas kernel)."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(sk)[None, :]
        s = jnp.where(rows >= cols, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         causal: bool = False,
                         sm_scale: Optional[float] = None,
                         force_flash: Optional[bool] = None,
                         cp_mesh=None, cp_axis: str = "data") -> jnp.ndarray:
    """Attention over [batch, heads, seq, head_dim]; picks kernel by shape.

    ``cp_mesh`` (a ``jax.sharding.Mesh``) opts into **context parallelism**:
    plain self-attention (no bias, non-causal, q_len == kv_len divisible by
    the axis size) is computed by the ring-flash algorithm with the sequence
    sharded over ``cp_axis`` (``ops/ring_attention.py``) — K/V chunks rotate
    over ICI via ``ppermute`` while each chip attends its local Q shard. The
    serving path for 2048²-class panels whose level-1 spatial attention does
    not fit (or saturate) one chip; see ``UNetMangaModel.cp_mesh``.
    """
    kv_len = k.shape[2]
    if (cp_mesh is not None and bias is None and not causal
            and q.shape[2] == kv_len
            and kv_len % cp_mesh.shape[cp_axis] == 0):
        from diffsensei_tpu.ops.ring_attention import ring_attention_sharded

        return ring_attention_sharded(q, k, v, cp_mesh, axis_name=cp_axis,
                                      sm_scale=sm_scale)
    use_flash = force_flash
    if use_flash is None:
        use_flash = _on_tpu() and kv_len >= _FLASH_MIN_KV and q.shape[-1] % 8 == 0
    if use_flash:
        return flash_attention(q, k, v, bias, causal=causal, sm_scale=sm_scale)
    # Tag the XLA path too ("attn"/"dots_attn" remat policies,
    # models/unet.py): saving the post-softmax output lets the remat replay
    # DCE the whole score/softmax chain of the short-kv cross-attentions.
    return checkpoint_name(
        attention_ref(q, k, v, bias, causal=causal, sm_scale=sm_scale),
        "attn_out")
