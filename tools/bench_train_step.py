"""Benchmark a stage-2-shaped UNet train step (fwd+bwd) on the real chip.

Measures the gradient computation through the full SDXL manga UNet at 1024²
(bf16 params+grads, jax.checkpoint rematerialization) — the per-chip kernel of
multi-chip training. Optimizer state is sharded across the mesh in real runs
(a single v5e cannot hold fp32 AdamW moments for 2.6B params), so this times
the compute that dominates a DP step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    # per-block remat: required to fit the 1024^2 backward in 16 GB.
    # REMAT_POLICY=dots_deepest|dots trades activation memory for replay time
    # (see UNetMangaModel.remat_policy).
    policy = os.environ.get("REMAT_POLICY") or None
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype,
                          remat_blocks=True, remat_policy=policy)
    res = int(os.environ.get("BENCH_TRAIN_RES", "1024"))
    b, lh, lw = 1, res // 8, res // 8

    ctx = jnp.zeros((b, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), dtype)
    time_ids = jnp.full((b, 6), 1024.0, jnp.float32)
    ip_tokens = jnp.zeros((b, manga.num_context_image_tokens,
                           cfg.cross_attention_dim), dtype)
    bbox = jnp.asarray([[[0., 0., .5, 1.], [.5, 0., 1., 1.],
                         [0.] * 4, [0.] * 4]], jnp.float32)
    biases = {
        level: build_ip_attention_bias(bbox, lh >> level, lw >> level,
                                       manga.num_vision_tokens,
                                       manga.num_dummy_tokens, dtype=dtype)
        for level in attention_levels(cfg)
    }
    dialog = jnp.zeros((b, manga.max_num_dialogs, 4), jnp.float32)
    sample = jnp.zeros((b, lh, lw, cfg.in_channels), dtype)
    t = jnp.full((b,), 500.0, jnp.float32)
    target = jnp.ones((b, lh, lw, cfg.out_channels), jnp.float32)

    print("init...", flush=True)
    params = unet.init(jax.random.key(0), sample, t, ctx, pooled, time_ids,
                       ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                       ip_scale=1.0, dialog_bbox=dialog)
    from diffsensei_tpu.utils.observability import device_memory_stats
    print("after init:", device_memory_stats(), flush=True)

    def loss_fn(p, x):
        pred = unet.apply(p, x, t, ctx, pooled, time_ids,
                           ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                           ip_scale=1.0, dialog_bbox=dialog)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.perf_counter()
    loss, grads = grad_fn(params, sample)
    # reduce leaf-by-leaf: a whole-tree abs() would transiently double the
    # 5.2 GB gradient allocation and OOM next to params+grads
    gsum = 0.0
    for g in jax.tree.leaves(grads):
        gsum += float(jnp.sum(jnp.abs(g).astype(jnp.float32)))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={float(loss):.4f} |g|={gsum:.3e}", flush=True)
    del grads   # keep only one 5.2 GB gradient tree alive at a time

    x = sample
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, grads = grad_fn(params, x)
        # chain on one grad leaf to force completion without extra allocs
        leaf = jax.tree.leaves(grads)[0]
        x = (x + 0.0 * jnp.mean(leaf.astype(jnp.float32))).astype(dtype)
        del grads
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"train fwd+bwd p50: {times[1]*1000:.1f} ms "
          f"(batch {b}, {res}^2, bf16, remat policy={policy})  "
          f"mem={device_memory_stats()}")


if __name__ == "__main__":
    main()
