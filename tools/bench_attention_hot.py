"""Tune flash blocks at the exact SDXL-1024² hot shapes.

Per the TPU op profile, attention is ~50% of the UNet forward:
level-1 self (2,10,4096,64) x10 instances, level-2 self (2,20,1024,64) x60.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.ops.attention import attention_ref
from diffsensei_tpu.ops.flash_attention import flash_attention


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
                        ("lvl2 (2,20,1024,64)", (2, 20, 1024, 64))]:
        q = jnp.asarray(rng.normal(size=shape), dtype)
        s = shape[2]
        rows = [name]
        try:
            t = timeit(jax.jit(lambda a, b, c: attention_ref(a, b, c)), q)
            rows.append(f"xla {t:6.2f}")
        except Exception as e:
            rows.append(f"xla ERR({type(e).__name__})")
        for bq in (512, 1024, 2048):
            for bk in (1024, 2048, 4096):
                if bq > s or bk > s:
                    continue
                try:
                    t = timeit(functools.partial(
                        flash_attention, block_q=bq, block_k=bk), q)
                    rows.append(f"f[{bq}x{bk}] {t:5.2f}")
                except Exception as e:
                    rows.append(f"f[{bq}x{bk}] ERR")
        print(" | ".join(rows))


if __name__ == "__main__":
    main()
