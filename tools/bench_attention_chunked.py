"""Experiment: in-kernel k-chunked softmax for MXU/VPU overlap.

The round-2 in-loop profile puts flash self-attention at 26.2 ms/denoise-step
with a measured pure-MXU floor of ~19.5 ms — the kernel sits ~2.1x above the
d=64-adjusted roofline (docs/PERF.md "Known headroom": remaining levers are
intra-kernel softmax/MXU overlap). The product forward computes one
[block_q, block_k] score dot, then one exp/max/sum pass over the whole tile:
a strict MXU -> VPU dependency chain, so the units serialize.

Hypothesis: keep the (1024, 2048) DMA granularity (bigger blocks measured
best) but run the online-softmax update over SUB-CHUNKS of the k block
inside the kernel. Chunk j+1's score dot has no data dependency on chunk j's
exp/rescale, so Mosaic's scheduler can overlap MXU(dot j+1) with VPU(exp j)
— at d=64 the two are nearly balanced, so perfect overlap would approach the
~1.9 -> ~1.2 ms ideal at the level-1 shape. Extra cost: one acc rescale
(block_q x 64) and max/corr bookkeeping per chunk instead of per block.

Run on the chip: python tools/bench_attention_chunked.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffsensei_tpu.ops.attention import attention_ref
from diffsensei_tpu.ops.flash_attention import flash_attention

NEG_INF = -1e30


def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                    sm_scale, block_k, chunk):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    acc = acc_ref[:]
    # static python loop: each chunk's score dot is independent of the
    # previous chunk's softmax ops -> schedulable on the MXU in parallel
    # with the VPU exp/rescale of the prior chunk.
    for j in range(block_k // chunk):
        kj = k_ref[0, 0, j * chunk:(j + 1) * chunk, :]
        vj = v_ref[0, 0, j * chunk:(j + 1) * chunk, :]
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_prev = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_prev = m_new
    m_ref[:] = jnp.broadcast_to(m_prev, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_prev, l_ref.shape)
    acc_ref[:] = acc

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "chunk"))
def chunked_attention(q, k, v, block_q=1024, block_k=2048, chunk=512):
    batch, heads, sq, d = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, kv_len)
    chunk = min(chunk, block_k)
    assert sq % block_q == 0 and kv_len % block_k == 0
    assert block_k % chunk == 0
    scale = d ** -0.5
    grid = (batch, heads, sq // block_q, kv_len // block_k)
    return pl.pallas_call(
        functools.partial(_chunked_kernel, sm_scale=scale,
                          block_k=block_k, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)


def timeit(fn, q, reps=20):
    out = fn(q, q, q)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    x = q
    for _ in range(reps):
        x = fn(x, q, q).astype(q.dtype)
    float(jnp.sum(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    print("backend:", jax.default_backend())
    for name, shape in [("lvl1 (2,10,4096,64)", (2, 10, 4096, 64)),
                        ("lvl2 (2,20,1024,64)", (2, 20, 1024, 64)),
                        ("16k  (2,10,16384,64)", (2, 10, 16384, 64))]:
        q = jnp.asarray(rng.normal(size=shape), dtype)
        # numeric check vs the product kernel at this shape; fail fast so a
        # wrong kernel can never report "winning" timings
        ref = flash_attention(q, q, q)
        got = chunked_attention(q, q, q)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        assert err <= 2e-2, f"{name}: chunked vs flash maxerr {err:.2e} > 2e-2"
        if shape[2] <= 1024:  # anchor BOTH kernels to the exact oracle once
            exact = attention_ref(q.astype(jnp.float32), q.astype(jnp.float32),
                                  q.astype(jnp.float32))
            for label, out in (("flash", ref), ("chunked", got)):
                oerr = float(jnp.max(jnp.abs(exact - out.astype(jnp.float32))))
                assert oerr <= 2e-2, \
                    f"{name}: {label} vs exact oracle maxerr {oerr:.2e} > 2e-2"
        rows = [name, f"maxerr {err:.2e}"]
        t = timeit(flash_attention, q)
        rows.append(f"flash[1024x2048] {t:5.2f}")
        for chunk in (256, 512, 1024):
            t = timeit(functools.partial(chunked_attention, chunk=chunk), q)
            rows.append(f"chunk{chunk} {t:5.2f}")
        print(" | ".join(rows), flush=True)


if __name__ == "__main__":
    main()
