"""Pallas TPU flash attention (forward).

Replaces the reference's CUDA attention dependencies: ``F.scaled_dot_product_attention``
in the UNet processors (``src/models/attention_processor.py:76,235,251``) and
``xformers.ops.memory_efficient_attention`` in the LLaMA fork
(``src/models/mllm/modeling_llama_xformer.py:225-237``).

Standard blocked online-softmax: grid (batch, heads, q_blocks, k_blocks) with the
k-block axis innermost so Pallas double-buffers K/V HBM->VMEM loads behind the MXU;
fp32 accumulators live in VMEM scratch across the k sweep and the output tile is
written once on the final k block. Supports an additive bias (the masked-IP bias,
broadcast over heads) and causal masking (LLaMA decode/train).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  sm_scale: float, causal: bool, block_q: int, block_k: int,
                  kv_len: int, bias_ref=None):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = ik * block_k

    def compute():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        v = v_ref[0, 0]  # [bk, d]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                          # [bq, bk]

        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)

        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)

        if kv_len % block_k != 0:
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(cols < kv_len, s, NEG_INF)
            # The OOB tail of the v block is unspecified memory (can be NaN);
            # p=0 there doesn't help since 0*NaN=NaN inside the dot. Zero it.
            vrows = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, v.shape[-1]), 0)
            v = jnp.where(vrows < kv_len, v, 0.0)

        m_prev = m_ref[:, :1]                                  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)             # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                 # [bq, bk]
        corr = jnp.exp(m_prev - m_new)                         # [bq, 1]

        l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    if causal:
        # Skip blocks strictly above the diagonal.
        @pl.when(k_start <= q_start + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Fused attention over [batch, heads, seq, head_dim] inputs.

    ``bias`` may be [B|1, H|1, Sq, Sk]; broadcast dims are honored without
    materializing the expansion (the BlockSpec index map pins them to 0).
    """
    batch, heads, sq, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5

    block_q = min(block_q, sq)
    block_k = min(block_k, kv_len)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(kv_len, block_k)

    grid = (batch, heads, nq, nk)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        bb = 0 if bias.shape[0] == 1 else None
        bh = 0 if bias.shape[1] == 1 else None
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda b, h, iq, ik, bb=bb, bh=bh: (
                bb if bb is not None else b,
                bh if bh is not None else h,
                iq, ik),
            memory_space=pltpu.VMEM))
        args.append(bias)

    kernel = functools.partial(
        _flash_kernel if bias is None else _flash_kernel_with_bias,
        sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*args)
    return out


def _flash_kernel_with_bias(q_ref, k_ref, v_ref, bias_ref, o_ref,
                            m_ref, l_ref, acc_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  bias_ref=bias_ref, **kw)
