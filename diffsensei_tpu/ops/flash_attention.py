"""Pallas TPU flash attention (forward + custom-VJP backward).

Replaces the reference's CUDA attention dependencies: ``F.scaled_dot_product_attention``
in the UNet processors (``src/models/attention_processor.py:76,235,251``) and
``xformers.ops.memory_efficient_attention`` in the LLaMA fork
(``src/models/mllm/modeling_llama_xformer.py:225-237``) — for both inference
and training (the reference trains through those CUDA kernels; here
``jax.grad`` hits the Pallas backward kernels below).

Forward: standard blocked online-softmax over grid (batch, heads, q_blocks,
k_blocks) with the k axis innermost so Pallas double-buffers K/V HBM→VMEM loads
behind the MXU; fp32 accumulators in VMEM scratch; the output tile and the row
log-sum-exp (saved for the backward) are written once on the final k block.

Backward: the FlashAttention-2 scheme. ``delta = rowsum(dO * O)`` is a cheap
XLA reduction; two Pallas kernels then recompute probabilities blockwise from
(Q, K, lse) — no S×K materialization:

* dQ kernel, grid (b, h, iq, ik):  dQ[iq] += (P ∘ (dO·Vᵀ − delta)) · K · scale
* dK/dV kernel, grid (b, h, ik, iq): dV[ik] += Pᵀ·dO;  dK[ik] += dSᵀ·Q · scale

The additive bias (masked-IP conditioning) is a constant mask built from
bboxes — its gradient is defined as zero. Causal masking skips whole blocks
above the diagonal in all three kernels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _bounds_mask(q_start, k_start, block_q, block_k, sq, sk, causal):
    """[bq, bk] bool validity: in-range rows/cols, under the causal diagonal."""
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    m = (rows < sq) & (cols < sk)
    if causal:
        m &= rows >= cols
    return m


def _row_valid(start, block, limit):
    idx = start + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    return idx < limit


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                sm_scale, causal, block_q, block_k, q_len, kv_len,
                bias_ref=None):
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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        # bounds/causal masking is wasted VPU work when every block is full
        # and non-causal (the UNet's power-of-two spatial shapes): skip it —
        # all quantities here are static Python ints.
        if causal or q_len % block_q != 0 or kv_len % block_k != 0:
            valid = _bounds_mask(q_start, k_start, block_q, block_k,
                                 q_len, kv_len, causal)
            s = jnp.where(valid, s, NEG_INF)
        if kv_len % block_k != 0:
            # OOB v tail is unspecified memory (can be NaN); 0*NaN = NaN in
            # the dot — zero it.
            vrows = _row_valid(k_start, block_k, kv_len)
            v = jnp.where(vrows, v, 0.0)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    if causal:
        @pl.when(k_start <= q_start + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[-2:])


def _fwd_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                     m_ref, l_ref, acc_ref, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                bias_ref=bias_ref, **kw)


def _forward(q, k, v, bias, causal, sm_scale, block_q, block_k):
    batch, heads, sq, d = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, kv_len)
    grid = (batch, heads, pl.cdiv(sq, block_q), pl.cdiv(kv_len, block_k))

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
                bh if bh is not None else h, iq, ik),
            memory_space=pltpu.VMEM))
        args.append(bias)

    kernel = functools.partial(
        _fwd_kernel if bias is None else _fwd_kernel_bias,
        sm_scale=sm_scale, causal=causal, block_q=block_q, block_k=block_k,
        q_len=sq, kv_len=kv_len)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, sq, d), q.dtype),
            # 8 lanes (the minimum the Pallas block rule allows when equal to
            # the array dim): 16x smaller than 128-padding — 42 MB vs 671 MB
            # of lse at 64k-token attention
            jax.ShapeDtypeStruct((batch, heads, sq, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(*args)
    return o, lse[..., :1]


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, sm_scale, causal, block_q, block_k, q_len, kv_len,
               bias_ref=None):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    q_start = iq * block_q
    k_start = ik * block_k

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        if causal or q_len % block_q != 0 or kv_len % block_k != 0:
            valid = _bounds_mask(q_start, k_start, block_q, block_k,
                                 q_len, kv_len, causal)
            p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)

        if kv_len % block_k != 0:
            tail = _row_valid(k_start, block_k, kv_len)
            v = jnp.where(tail, v, 0.0)
            k = jnp.where(tail, k, 0.0)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

    if causal:
        @pl.when(k_start <= q_start + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _dq_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                    dq_ref, acc_ref, **kw):
    _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, bias_ref=bias_ref, **kw)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale, causal,
                block_q, block_k, q_len, kv_len, bias_ref=None):
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)
    q_start = iq * block_q
    k_start = ik * block_k

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        if causal or q_len % block_q != 0 or kv_len % block_k != 0:
            valid = _bounds_mask(q_start, k_start, block_q, block_k,
                                 q_len, kv_len, causal)
            p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)

        if q_len % block_q != 0:
            tail = _row_valid(q_start, block_q, q_len)
            do = jnp.where(tail, do, 0.0)
            q = jnp.where(tail, q, 0.0)

        # dV[ik] += P^T @ dO
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dS = P * (dP - delta);  dK[ik] += dS^T @ Q * scale
        v = v_ref[0, 0]
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

    if causal:
        @pl.when(q_start + block_q - 1 >= k_start)
        def _():
            compute()
    else:
        compute()

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _dkv_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     bias_ref, dk_ref, dv_ref, dk_acc, dv_acc, **kw):
    _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, bias_ref=bias_ref, **kw)


def _backward(res, g, causal, sm_scale, block_q, block_k):
    q, k, v, bias, o, lse = res
    batch, heads, sq, d = q.shape
    kv_len = k.shape[2]
    # The bwd kernels hold p/dp/ds [bq, bk] fp32 tiles simultaneously — the
    # forward's (1024, 2048) blocks exceed VMEM here (measured 22.4M > 16M on
    # v5e); cap the backward at (512, 1024) independently.
    block_q = min(block_q, 512, sq)
    block_k = min(block_k, 1024, kv_len)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(kv_len, block_k)

    do = g
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)                    # [B,H,Sq,1]
    # 8-lane stats (minimum tile when equal to the array dim): ~84 MB of
    # lse+delta at 64k tokens vs 1.3 GB with 128-lane padding
    lse8 = jnp.broadcast_to(lse, (batch, heads, sq, 8))
    delta8 = jnp.broadcast_to(delta, (batch, heads, sq, 8))

    def qspec(ax):
        return pl.BlockSpec((1, 1, block_q, ax),
                            lambda b, h, iq, ik: (b, h, iq, 0),
                            memory_space=pltpu.VMEM)

    def kspec(ax):
        return pl.BlockSpec((1, 1, block_k, ax),
                            lambda b, h, iq, ik: (b, h, ik, 0),
                            memory_space=pltpu.VMEM)

    def bias_spec():
        bb = 0 if bias.shape[0] == 1 else None
        bh = 0 if bias.shape[1] == 1 else None
        return pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda b, h, iq, ik, bb=bb, bh=bh: (
                bb if bb is not None else b,
                bh if bh is not None else h, iq, ik),
            memory_space=pltpu.VMEM)

    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, q_len=sq, kv_len=kv_len)

    # --- dQ: grid (b, h, iq, ik) -------------------------------------------
    in_specs = [qspec(d), kspec(d), kspec(d), qspec(d), qspec(8), qspec(8)]
    args = [q, k, v, do, lse8, delta8]
    kernel = functools.partial(_dq_kernel, **kw)
    if bias is not None:
        in_specs.append(bias_spec())
        args.append(bias)
        kernel = functools.partial(_dq_kernel_bias, **kw)
    dq = pl.pallas_call(
        kernel,
        grid=(batch, heads, nq, nk),
        in_specs=in_specs,
        out_specs=qspec(d),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(*args)

    # --- dK/dV: grid (b, h, ik, iq) ------------------------------------------
    def qspec2(ax):
        return pl.BlockSpec((1, 1, block_q, ax),
                            lambda b, h, ik, iq: (b, h, iq, 0),
                            memory_space=pltpu.VMEM)

    def kspec2(ax):
        return pl.BlockSpec((1, 1, block_k, ax),
                            lambda b, h, ik, iq: (b, h, ik, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qspec2(d), kspec2(d), kspec2(d), qspec2(d), qspec2(8),
                qspec2(8)]
    args = [q, k, v, do, lse8, delta8]
    kernel = functools.partial(_dkv_kernel, **kw)
    if bias is not None:
        bb = 0 if bias.shape[0] == 1 else None
        bh = 0 if bias.shape[1] == 1 else None
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda b, h, ik, iq, bb=bb, bh=bh: (
                bb if bb is not None else b,
                bh if bh is not None else h, iq, ik),
            memory_space=pltpu.VMEM))
        args.append(bias)
        kernel = functools.partial(_dkv_kernel_bias, **kw)
    dk, dv = pl.pallas_call(
        kernel,
        grid=(batch, heads, nk, nq),
        in_specs=in_specs,
        out_specs=(kspec2(d), kspec2(d)),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(*args)

    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------
# The forward kernel and the gradient attachment are SEPARATE equations so
# selective rematerialization can prune the forward replay. A monolithic
# custom_vjp (fwd kernel inside the vjp-fwd rule) forces jax.checkpoint to
# re-run the Pallas forward during the backward pass to rebuild residuals —
# the "70 replayed flash forwards" shelf in the round-3 train profile
# (docs/PERF.md). Here the Pallas forward (`_flash_pair`) is a plain traced
# call whose outputs (o, lse) are tagged with ``checkpoint_name`` by
# ``flash_attention``; ``_attach_grad`` is an IDENTITY on ``o`` whose
# custom-vjp residuals are (q, k, v, bias, o, lse). Under
# ``UNetMangaModel.remat_policy in ("attn", "dots_attn")`` the policy saves
# the tagged pair, the `_flash_pair` equation produces only saved values and
# is dead-code-eliminated from the remat replay, and the replayed identity is
# free — the backward Pallas kernels read the SAVED o/lse. With no remat (or
# no names policy) the structure is cost-identical to the monolithic form:
# one forward kernel call, same residuals, same backward.


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def _flash_pair(q, k, v, bias, causal, sm_scale, block_q, block_k):
    return _forward(q, k, v, bias, causal, sm_scale, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _attach_grad(q, k, v, bias, o, lse, causal, sm_scale, block_q, block_k):
    return o


def _attach_fwd(q, k, v, bias, o, lse, causal, sm_scale, block_q, block_k):
    return o, (q, k, v, bias, o, lse)


def _attach_bwd(causal, sm_scale, block_q, block_k, res, g):
    dq, dk, dv, dbias = _backward(res, g, causal, sm_scale, block_q, block_k)
    # o/lse enter through stop_gradient at the call site; their cotangents
    # are discarded (XLA DCEs the zeros).
    return dq, dk, dv, dbias, jnp.zeros_like(res[4]), jnp.zeros_like(res[5])


_attach_grad.defvjp(_attach_fwd, _attach_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 2048,
) -> jnp.ndarray:
    """Fused attention over [batch, heads, seq, head_dim]; differentiable.

    ``bias`` may be [B|1, H|1, Sq, Sk]; broadcast dims are honored without
    materializing the expansion (the BlockSpec index map pins them to 0). The
    bias gradient is zero (it is a constant bbox mask in this framework).

    Default blocks (1024, 2048) measured fastest on v5e across the UNet's
    spatial shapes (tools/bench_attention_hot.py: 1.66ms @1k, ~2.8ms @4k,
    23.9ms @16k tokens for the CFG-batched head counts — 2.1x over the naive
    512x512 blocking at 16k); XLA attention OOMs beyond ~16k tokens, flash is
    mandatory there. (1024, 4096) exceeds VMEM in the backward.

    Outputs are tagged ``attn_out`` / ``attn_lse`` for selective remat
    (``jax.checkpoint_policies.save_only_these_names``): saving the pair lets
    the backward skip replaying the forward kernel entirely (see the module
    comment above ``_flash_pair``).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    # stop_gradient on the kernel inputs: the forward pallas_call must never
    # be differentiated (no JVP rule) — all gradients flow through
    # _attach_grad's custom VJP below.
    o, lse = _flash_pair(jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
                         jax.lax.stop_gradient(v),
                         jax.lax.stop_gradient(bias),
                         causal, sm_scale, block_q, block_k)
    o = checkpoint_name(o, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return _attach_grad(q, k, v, bias, o, lse,
                        causal, sm_scale, block_q, block_k)
