"""Microbenchmark: XLA attention vs Pallas flash at DiffSensei UNet shapes.

Run on the real chip to tune the dispatcher threshold and block sizes:
  python tools/bench_attention.py
Shapes: SDXL-1024^2 CFG batch → level-1 self-attn (2, 10, 16384, 64),
level-2 (2, 20, 4096, 64); masked-IP cross-attn (kv 80, bias). 512^2 halves
the sequence lengths.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.ops.attention import attention_ref
from diffsensei_tpu.ops.flash_attention import flash_attention


def timeit(fn, q, k, v, reps=10):
    """Chain reps through the q input and force a host fetch — under the
    axon tunnel, block_until_ready alone returns before remote execution."""
    out = fn(q, k, v)
    float(jnp.sum(out))  # warmup + compile barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        q = fn(q, k, v)
    float(jnp.sum(q))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    print(f"backend: {jax.default_backend()}")

    shapes = [
        ("lvl1@1024^2 self", (2, 10, 16384, 64), None),
        ("lvl2@1024^2 self", (2, 20, 4096, 64), None),
        ("lvl1@512^2 self", (2, 10, 4096, 64), None),
        ("lvl1@2048^2 self", (2, 10, 65536, 64), None),
        ("lvl1@1024^2 ip-xattn", (2, 10, 16384, 64), 80),
        ("lvl2@1024^2 ip-xattn", (2, 20, 4096, 64), 80),
    ]
    for name, (b, h, s, d), kv in shapes:
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
        if kv is None:
            k = v = q
            bias = None
        else:
            k = jnp.asarray(rng.normal(size=(b, h, kv, d)), dtype)
            v = k
            bias = jnp.asarray(
                rng.choice([0.0, -10000.0], size=(b, 1, s, kv)), dtype)
        try:
            t_xla = timeit(jax.jit(
                lambda q, k, v: attention_ref(q, k, v, bias)), q, k, v)
        except Exception as e:
            t_xla = float("nan")
            print(f"  xla failed: {type(e).__name__}")
        row = f"{name:26s} xla {t_xla:8.2f} ms"
        if kv is None or kv >= 128:
            for bq, bk in ((512, 512), (1024, 512), (512, 1024), (2048, 512)):
                if bq > s or bk > (kv or s):
                    continue
                try:
                    t = timeit(lambda q, k, v: flash_attention(
                        q, k, v, block_q=bq, block_k=bk), q, k, v)
                    row += f" | flash[{bq}x{bk}] {t:7.2f}"
                except Exception as e:
                    row += f" | flash[{bq}x{bk}] ERR({type(e).__name__})"
        print(row)


if __name__ == "__main__":
    main()
