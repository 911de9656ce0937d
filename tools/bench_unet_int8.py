"""int8-UNet serving probe: perf + quality bound vs the bf16 UNet.

VERDICT r4 next #1: the co-resident config-#4 topology needs the UNet's
transformer matmuls in weight-only int8 (``models/quant_unet.py``), dropping
the resident tree 5.42 → ~3.0 GiB. The UNet forward at 1024² is MXU-bound,
so int8 is a *memory* lever — this tool verifies the perf is ~parity (not a
regression from the extra int8→bf16 converts) and records the quality bound:

* random bf16 SDXL UNet (jitted init — identical FLOPs to trained weights),
  20-step CFG denoise at BENCH_RES (default 1024²) → reference latents;
* the SAME weights quantized host-side → int8 model, same denoise →
  quantized latents;
* reports per-step wall/device ms for both, single-forward eps relative
  error, and end-trajectory latent PSNR/cosine. Caveat (same class as the
  DeepCache table, docs/PERF.md): random weights bound STRUCTURAL drift
  only — trained-weight fidelity needs released checkpoints this
  environment does not ship.

Writes `.bench-cache/unet_int8.json` for bench.py's co-resident leg.
Run: python tools/bench_unet_int8.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
MARKER = os.path.join(_REPO, ".bench-cache", "unet_int8.json")
STEPS = 20
HEIGHT = WIDTH = int(os.environ.get("BENCH_RES", "1024"))


def main() -> dict:
    import jax
    import jax.numpy as jnp

    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.quant_unet import (quantize_unet_params,
                                                  tree_bytes)
    from diffsensei_tpu.models.schedulers import (make_sampler,
                                                  scale_model_input)
    from diffsensei_tpu.models.schedulers import step as scheduler_step
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    lh, lw = HEIGHT // 8, WIDTH // 8
    b = 1
    sampler = make_sampler("euler_discrete", STEPS)

    rng = jax.random.key(0)
    ctx = jax.random.normal(rng, (2 * b, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((2 * b, cfg.pooled_projection_dim), dtype)
    time_ids = jnp.full((2 * b, 6), float(HEIGHT), jnp.float32)
    ip_tokens = jax.random.normal(
        jax.random.key(1),
        (2 * b, manga.num_context_image_tokens, cfg.cross_attention_dim),
        dtype)
    bbox = jnp.tile(jnp.asarray(
        [[[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 1.0, 1.0],
          [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]]], jnp.float32),
        (2 * b, 1, 1))
    biases = {
        level: build_ip_attention_bias(bbox, lh >> level, lw >> level,
                                       manga.num_vision_tokens,
                                       manga.num_dummy_tokens, dtype=dtype)
        for level in attention_levels(cfg)
    }
    dialog = jnp.tile(jnp.asarray(
        [[[0.1, 0.0, 0.5, 0.2]] + [[0.0] * 4] * 7], jnp.float32),
        (2 * b, 1, 1))
    call_kw = dict(ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                   ip_scale=0.6, dialog_bbox=dialog)

    def build_denoise(unet):
        @jax.jit
        def denoise(params, latents):
            def body(i, lat):
                lat_in = jnp.concatenate([lat, lat], axis=0)
                lat_in = scale_model_input(sampler, lat_in, i).astype(dtype)
                t = jnp.broadcast_to(sampler.timesteps[i], (2 * b,))
                eps = unet.apply(params, lat_in, t, ctx, pooled, time_ids,
                                 **call_kw)
                e_neg, e_pos = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                eps = e_neg + 7.5 * (e_pos - e_neg)
                return scheduler_step(sampler, eps, i, lat)

            latents = latents * sampler.init_noise_sigma
            return jax.lax.fori_loop(0, STEPS, body, latents)

        return denoise

    def time_denoise(denoise, params, lat, reps=3):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            lat = denoise(params, lat * 0.5 + 0.5)
            float(jnp.sum(lat))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    # ---- bf16 reference -----------------------------------------------------
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype)
    init_args = (jnp.zeros((2 * b, lh, lw, cfg.in_channels), dtype),
                 jnp.zeros((2 * b,)), ctx, pooled, time_ids)
    t0 = time.perf_counter()
    params = jax.jit(lambda k: unet.init(k, *init_args, **call_kw))(
        jax.random.key(2))
    jax.block_until_ready(params)
    print(f"# random bf16 init {time.perf_counter() - t0:.0f}s", flush=True)

    denoise = build_denoise(unet)
    lat0 = jax.random.normal(jax.random.key(3),
                             (b, lh, lw, cfg.in_channels), jnp.float32)
    t0 = time.perf_counter()
    lat_ref = denoise(params, lat0)
    float(jnp.sum(lat_ref))
    print(f"# bf16 first call {time.perf_counter() - t0:.0f}s", flush=True)
    bf16_s = time_denoise(denoise, params, lat0)
    # single-forward eps (quality anchor less confounded by trajectory drift)
    t_mid = jnp.broadcast_to(sampler.timesteps[STEPS // 2], (2 * b,))
    sample_mid = jnp.concatenate([lat0, lat0], axis=0).astype(dtype)
    eps_ref = jax.jit(lambda p: unet.apply(p, sample_mid, t_mid, ctx, pooled,
                                           time_ids, **call_kw))(params)
    eps_ref = jnp.asarray(eps_ref.astype(jnp.float32))
    float(jnp.sum(eps_ref))

    # ---- quantize host-side, free the bf16 tree, serve int8 ---------------
    t0 = time.perf_counter()
    qparams = quantize_unet_params(params)
    quant_s = time.perf_counter() - t0
    # free the replaced bf16 kernels (non-target leaves are passed through by
    # reference and stay live in qparams)
    kept = {id(leaf) for leaf in jax.tree.leaves(qparams)}
    for leaf in jax.tree.leaves(params):
        if id(leaf) not in kept:
            try:
                leaf.delete()
            except Exception:  # noqa: BLE001
                pass
    qparams = jax.tree.map(jnp.asarray, qparams)
    jax.block_until_ready(qparams)
    total_b, int8_b = tree_bytes(qparams)
    print(f"# quantized in {quant_s:.0f}s: tree {total_b / 2**30:.2f} GiB "
          f"({int8_b / 2**30:.2f} int8)", flush=True)

    qunet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype,
                           quantized=True)
    qdenoise = build_denoise(qunet)
    t0 = time.perf_counter()
    lat_q = qdenoise(qparams, lat0)
    float(jnp.sum(lat_q))
    print(f"# int8 first call {time.perf_counter() - t0:.0f}s", flush=True)
    int8_s = time_denoise(qdenoise, qparams, lat0)
    eps_q = jax.jit(lambda p: qunet.apply(p, sample_mid, t_mid, ctx, pooled,
                                          time_ids, **call_kw))(qparams)
    eps_q = jnp.asarray(eps_q.astype(jnp.float32))

    # ---- metrics ------------------------------------------------------------
    import numpy as np

    a, q = np.asarray(lat_ref, np.float64), np.asarray(lat_q, np.float64)
    mse = float(np.mean((a - q) ** 2))
    rng_ = float(a.max() - a.min())
    psnr = 10 * math.log10(rng_ ** 2 / mse) if mse else float("inf")
    cos = float((a * q).sum() / (np.linalg.norm(a) * np.linalg.norm(q)))
    er, eq = np.asarray(eps_ref, np.float64), np.asarray(eps_q, np.float64)
    eps_rel = float(np.linalg.norm(eq - er) / (np.linalg.norm(er) + 1e-12))

    result = {
        "res": HEIGHT,
        "bf16_denoise_s": round(bf16_s, 3),
        "int8_denoise_s": round(int8_s, 3),
        "int8_step_ms": round(int8_s / STEPS * 1000, 2),
        "int8_tree_gib": round(total_b / 2**30, 3),
        "latent_psnr_db": round(psnr, 2),
        "latent_cos": round(cos, 5),
        "eps_rel_l2": round(eps_rel, 4),
        "backend": jax.default_backend(),
    }
    if jax.default_backend() != "cpu":
        os.makedirs(os.path.dirname(MARKER), exist_ok=True)
        with open(MARKER, "w") as f:
            json.dump(result, f)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
