"""Ring attention: sequence-parallel exact attention over a mesh axis.

SURVEY §5 "long-context": the reference has no sequence/context parallelism —
its only long-sequence story is memory-efficient CUDA attention on one GPU.
This module adds the TPU-native stretch goal: the spatial self-attention of
very large panels (2048² ⇒ 64k tokens at UNet level 1) sharded across chips.

Scheme (ring flash attention): every device holds a sequence shard of Q, K, V.
For ``n = axis_size`` steps each device attends its local Q block to the
currently-held K/V chunk, accumulating online-softmax state (running max m,
denominator l, weighted accumulator acc), then rotates the K/V chunk to its
ring neighbor with ``jax.lax.ppermute`` — compute overlaps the ICI transfer
under XLA's scheduler. After n steps every Q block has attended the full
global sequence exactly; no materialized S×S anywhere.

Per-chunk attention runs through the Pallas flash kernel's (o, lse) forward on
TPU and a jnp oracle elsewhere; chunks merge with the standard log-sum-exp
combine. Forward-only (serving path); training at 64k tokens fits single-chip
via the flash kernel + remat.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

import diffsensei_tpu.ops.flash_attention as fa


def _chunk_attention_ref(q, k, v, sm_scale):
    """jnp (o, lse) for one chunk — the CPU/mesh-test path."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    lse = m + jnp.log(l)
    return o / l, lse[..., 0]            # [B,H,Sq,D] fp32, [B,H,Sq]


def _chunk_attention_pallas(q, k, v, sm_scale):
    o, lse = fa._forward(q, k, v, None, False, sm_scale,
                         block_q=512, block_k=1024)
    return o.astype(jnp.float32), lse[..., 0]


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Exact attention with sequence sharded over ``axis_name``.

    Call inside ``shard_map`` (or pmap) with q/k/v LOCAL shards
    [B, H, S_local, D]; returns the local output shard. Non-causal (UNet
    spatial attention); K/V chunks ride the ICI ring.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    chunk_fn = _chunk_attention_pallas if use_pallas else _chunk_attention_ref

    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    o0, lse0 = chunk_fn(q, k, v, sm_scale)

    def body(step, carry):
        o_acc, lse_acc, kc, vc = carry
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        o_new, lse_new = chunk_fn(q, kc, vc, sm_scale)
        # log-sum-exp merge of two normalized partials
        lse_max = jnp.maximum(lse_acc, lse_new)
        w_acc = jnp.exp(lse_acc - lse_max)[..., None]
        w_new = jnp.exp(lse_new - lse_max)[..., None]
        o_acc = (o_acc * w_acc + o_new * w_new) / (w_acc + w_new)
        lse_acc = lse_max + jnp.log(jnp.exp(lse_acc - lse_max)
                                    + jnp.exp(lse_new - lse_max))
        return o_acc, lse_acc, kc, vc

    o, lse, _, _ = jax.lax.fori_loop(0, n - 1, body, (o0, lse0, k, v))
    return o.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, axis_name: str = "data",
                           sm_scale: Optional[float] = None):
    """Convenience wrapper: global [B, H, S, D] arrays → shard_map ring.

    S must divide the mesh axis size; inputs/outputs are sharded on S.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(ring_flash_attention, axis_name=axis_name,
                          sm_scale=sm_scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
