"""DeepCache speed/quality table at SDXL scale (VERDICT r3 weak #5).

Runs the PRODUCT denoise loop (`pipelines.pipeline._denoise`) at 1024², 20
Euler steps, CFG, full masked-IP + dialog conditioning, with
``cache_interval`` in {None, 2, 3} on identical latents, and reports for each
N: wall s/panel (min-of-3), latent MSE vs the exact run, and decoded-image
PSNR vs the exact image — the row a user picks N from (docs/PERF.md).

Caveat recorded with the numbers: weights are random (no trained checkpoint
exists in this environment), so the drift figures bound the STRUCTURAL error
of splicing a stale deep feature, not the perceptual error of the released
model — trained UNets have smoother step-to-step deep features, so production
drift should be below these readings. The mechanism contract (N=1 bit-exact)
is covered by tests/test_deep_cache.py.

Run: python tools/bench_deepcache_fidelity.py   (BENCH_RES to override)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
HEIGHT = WIDTH = int(os.environ.get("BENCH_RES", "1024"))


def main() -> None:
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import UNetConfig, VAEConfig
    from diffsensei_tpu.models.schedulers import make_sampler
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.models.vae import AutoencoderKL
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias
    from diffsensei_tpu.pipelines.pipeline import _denoise

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype)
    lh, lw = HEIGHT // 8, WIDTH // 8
    sampler = make_sampler("euler_discrete", STEPS)

    rng = jax.random.key(0)
    ctx = jax.random.normal(rng, (2, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((2, cfg.pooled_projection_dim), dtype)
    time_ids = jnp.full((2, 6), float(HEIGHT), jnp.float32)
    ip_tokens = jax.random.normal(
        jax.random.key(1),
        (2, manga.num_context_image_tokens, cfg.cross_attention_dim), dtype)
    bbox = jnp.tile(jnp.asarray(
        [[[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 1.0, 1.0],
          [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]]], jnp.float32),
        (2, 1, 1))
    biases = {
        level: build_ip_attention_bias(bbox, lh >> level, lw >> level,
                                       manga.num_vision_tokens,
                                       manga.num_dummy_tokens, dtype=dtype)
        for level in attention_levels(cfg)
    }
    dialog = jnp.tile(jnp.asarray(
        [[[0.1, 0.0, 0.5, 0.2]] + [[0.0] * 4] * 7], jnp.float32), (2, 1, 1))

    # random params, same FLOPs as trained (bench methodology)
    init_lat = jnp.zeros((2, lh, lw, cfg.in_channels), dtype)
    params = jax.jit(lambda k: unet.init(
        k, init_lat, jnp.zeros((2,)), ctx, pooled, time_ids,
        ip_hidden_states=ip_tokens, ip_attn_bias=biases, ip_scale=0.6,
        dialog_bbox=dialog))(jax.random.key(2))

    vae = AutoencoderKL(VAEConfig.sdxl())
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), jax.random.key(1))
    )(jax.random.key(4))

    @jax.jit
    def decode(z):
        img = vae.apply(vae_params, z.astype(jnp.float32) / 0.13025,
                        method=vae.decode)
        return jnp.clip(img / 2 + 0.5, 0, 1)

    latents0 = jax.random.normal(jax.random.key(3),
                                 (1, lh, lw, cfg.in_channels), jnp.float32)

    def run(interval):
        def go():
            return _denoise(unet, params, sampler, latents0, ctx, pooled,
                            time_ids, ip_tokens, biases, dialog,
                            jnp.asarray(7.5, jnp.float32),
                            jnp.asarray(0.6, jnp.float32), use_ip=True,
                            cache_interval=interval, cache_split=2)
        lat = go()
        float(jnp.sum(lat))                        # compile + barrier
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lat = go()
            float(jnp.sum(lat))
            best = min(best, time.perf_counter() - t0)
        return np.asarray(lat, np.float32), best

    base_lat, base_s = run(None)
    base_img = np.asarray(decode(base_lat), np.float32)
    print(f"# exact: {base_s:.3f} s/panel denoise "
          f"(latent std {base_lat.std():.3f})", flush=True)
    for n in (2, 3):
        lat, s = run(n)
        img = np.asarray(decode(lat), np.float32)
        mse_lat = float(np.mean((lat - base_lat) ** 2))
        mse_img = float(np.mean((img - base_img) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse_img, 1e-12))
        print(f"N={n}: {s:.3f} s/panel ({base_s / s:.2f}x denoise speedup)  "
              f"latent MSE {mse_lat:.5f} (latent var "
              f"{float(base_lat.var()):.3f})  image PSNR {psnr:.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
