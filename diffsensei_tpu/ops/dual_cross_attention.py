"""Fused dual cross-attention kernel: text attention + masked-IP attention.

Every UNet transformer layer runs the reference ``MaskedIPAttnProcessor2_0``
combine (``src/models/attention_processor.py:213-258``): one query set, a
softmax over the 77 text keys, a second softmax over the 80 IP keys under the
bbox bias, summed as ``text + ip_scale * ip``. As two XLA attentions this
materializes two fp32 [B, H, S, K] score tensors per layer; measured on v5e
the composite costs ~0.62 ms/layer standalone (HBM-bound) across the ~70
layers of a denoise step.

Both key sets fit in one VMEM tile (<=128 keys), so this kernel computes both
softmaxes per q-block entirely on-chip — single pass, no online-softmax
bookkeeping, no score materialization. Returns the two attention outputs
separately; the caller applies ``o_text + ip_scale * o_ip`` (ip_scale is a
traced scalar, and XLA fuses the combine into the surrounding graph).

Gradients: the public entry recomputes through the XLA composite in the VJP
(`ops/attention.attention_ref`) — cross-attention KV is tiny, so recompute is
cheap and keeps training numerics on the reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_K_PAD = 128  # both key sets pad to one 128-lane tile


def _kernel(q_ref, kt_ref, vt_ref, ki_ref, vi_ref, bias_ref,
            ot_ref, oi_ref, *, sm_scale, kt_len, ki_len):
    q = q_ref[0, 0]

    def one_softmax_attn(k_ref, v_ref, klen, bias):
        s = jax.lax.dot_general(q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if bias is not None:
            s = s + bias.astype(jnp.float32)
        if klen < _K_PAD:
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < klen, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ot_ref[0, 0] = one_softmax_attn(kt_ref, vt_ref, kt_len,
                                    None).astype(ot_ref.dtype)
    oi_ref[0, 0] = one_softmax_attn(ki_ref, vi_ref, ki_len,
                                    bias_ref[0, 0]).astype(oi_ref.dtype)


def _pad_keys(k):
    pad = _K_PAD - k.shape[2]
    return k if pad == 0 else jnp.pad(k, ((0, 0),) * 2 + ((0, pad), (0, 0)))


def _forward(q, kt, vt, ki, vi, bias, sm_scale, block_q):
    batch, heads, sq, d = q.shape
    kt_len, ki_len = kt.shape[2], ki.shape[2]
    block_q = min(block_q, sq)
    kt, vt, ki, vi = map(_pad_keys, (kt, vt, ki, vi))
    if bias.shape[-1] < _K_PAD:
        bias = jnp.pad(bias, ((0, 0),) * 3 + ((0, _K_PAD - bias.shape[-1]),))

    grid = (batch, heads, pl.cdiv(sq, block_q))
    qspec = pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq: (b, h, iq, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, _K_PAD, d), lambda b, h, iq: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bb = 0 if bias.shape[0] == 1 else None
    bh = 0 if bias.shape[1] == 1 else None
    bspec = pl.BlockSpec(
        (1, 1, block_q, _K_PAD),
        lambda b, h, iq, bb=bb, bh=bh: (bb if bb is not None else b,
                                        bh if bh is not None else h, iq, 0),
        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((batch, heads, sq, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, kt_len=kt_len,
                          ki_len=ki_len),
        grid=grid,
        in_specs=[qspec, kspec, kspec, kspec, kspec, bspec],
        out_specs=(qspec, qspec),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q, kt, vt, ki, vi, bias)


def _composite(q, kt, vt, ki, vi, bias, sm_scale):
    from diffsensei_tpu.ops.attention import attention_ref

    return (attention_ref(q, kt, vt, sm_scale=sm_scale),
            attention_ref(q, ki, vi, bias=bias, sm_scale=sm_scale))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _dual(q, kt, vt, ki, vi, bias, sm_scale, block_q):
    return _forward(q, kt, vt, ki, vi, bias, sm_scale, block_q)


def _dual_fwd(q, kt, vt, ki, vi, bias, sm_scale, block_q):
    return _forward(q, kt, vt, ki, vi, bias, sm_scale, block_q), \
        (q, kt, vt, ki, vi, bias)


def _dual_bwd(sm_scale, block_q, res, g):
    q, kt, vt, ki, vi, bias = res
    _, vjp = jax.vjp(
        lambda q, kt, vt, ki, vi: _composite(q, kt, vt, ki, vi, bias,
                                             sm_scale),
        q, kt, vt, ki, vi)
    return vjp(g) + (jnp.zeros_like(bias),)


_dual.defvjp(_dual_fwd, _dual_bwd)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q"))
def dual_cross_attention(q, kt, vt, ki, vi, bias, *, sm_scale=None,
                         block_q=1024):
    """Fused (text, masked-IP) attention pair over [B, H, S, d] queries.

    ``kt``/``vt`` are the text keys/values (<=128 keys), ``ki``/``vi`` the IP
    keys/values (<=128), ``bias`` [B|1, H|1, S, K_ip] the precomputed bbox
    bias. Returns ``(o_text, o_ip)`` — combine as ``o_text + ip_scale*o_ip``.
    The bias gradient is zero (constant bbox mask); other grads recompute
    through the XLA composite.
    """
    assert kt.shape[2] <= _K_PAD and ki.shape[2] <= _K_PAD
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    if bias.ndim == 3:
        bias = bias[:, None]
    return _dual(q, kt, vt, ki, vi, bias, scale, block_q)
