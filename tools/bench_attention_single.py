"""Prototype: single-pass (non-online) flash attention for moderate KV.

Hypothesis: at the UNet's 1k-16k token self-attention, the online-softmax
k-loop (running max/denominator correction per k block) is overhead — when a
q-block's full score row fits VMEM, one exact softmax pass is cheaper.
Grid (b, h, iq); K/V streamed per q block by the pipeline.

Run on the chip: python tools/bench_attention_single.py
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


def _single_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def single_pass_attention(q, k, v, block_q=512):
    b, h, sq, d = q.shape
    kv = k.shape[2]
    scale = d ** -0.5
    return pl.pallas_call(
        functools.partial(_single_kernel, sm_scale=scale),
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q, k, v)


def timeit(fn, q, k, v, reps=10):
    out = fn(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        q = fn(q, k, v).astype(q.dtype)
    float(jnp.sum(q.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    print("backend:", jax.default_backend())
    for name, (b, h, s, d) in [
        ("lvl1 self (2,10,4096,64)", (2, 10, 4096, 64)),
        ("lvl2 self (2,20,1024,64)", (2, 20, 1024, 64)),
        ("16k self (2,10,16384,64)", (2, 10, 16384, 64)),
    ]:
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
        row = name
        for bq in (512, 256, 128):
            if bq > s:
                continue
            try:
                t = timeit(functools.partial(single_pass_attention,
                                             block_q=bq), q, q, q)
                row += f" | single[{bq}] {t:7.2f}"
            except Exception as e:
                row += f" | single[{bq}] ERR({type(e).__name__})"
        t = timeit(lambda q, k, v: flash_attention(q, k, v), q, q, q)
        row += f" | flash {t:7.2f} ms"
        # correctness
        try:
            got = single_pass_attention(q, q, q, block_q=min(512, s))
            want = attention_ref(q.astype(jnp.float32), q.astype(jnp.float32),
                                 q.astype(jnp.float32))
            err = float(jnp.abs(got.astype(jnp.float32) - want).max())
            row += f" | maxerr {err:.3e}"
        except Exception:
            pass
        print(row)


if __name__ == "__main__":
    main()
