"""Preview serving mode: DPM-Solver++ (2M) at 12 steps + DeepCache N=2.

The two serving knobs this framework adds beyond the reference compose:
DPM-Solver++ is a 2nd-order integrator (same quality class as ~20 Euler
steps at ~12 steps — the standard diffusers guidance for
``DPMSolverMultistepScheduler``), and DeepCache N=2 recomputes the UNet's
deep subtree every other step (measured fidelity table in docs/PERF.md).
Neither knob exists in the reference (it serves 30-step DDIM/Euler only,
``configs/inference/diffsensei.yaml:1-2``).

Measures the PRODUCT denoise loop (`pipelines.pipeline._denoise`) at 1024²,
CFG, full masked-IP + dialog conditioning, on identical latents:

  A. exact:    euler 20 steps, no cache        (the bench.py headline leg)
  B. dpm12:    dpmsolver++ 12 steps, no cache
  C. preview:  dpmsolver++ 12 steps, DeepCache N=2

and reports s/panel (min-of-3) + speedup vs A. Served via
``serve/cli.py --scheduler dpmsolver++ --steps 12 --deep-cache 2``.

Run: python tools/bench_preview.py   (BENCH_RES to override resolution)
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

HEIGHT = WIDTH = int(os.environ.get("BENCH_RES", "1024"))


def main() -> None:
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.schedulers import make_sampler
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias
    from diffsensei_tpu.pipelines.pipeline import _denoise

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype)
    lh, lw = HEIGHT // 8, WIDTH // 8

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

    init_lat = jnp.zeros((2, lh, lw, cfg.in_channels), dtype)
    params = jax.jit(lambda k: unet.init(
        k, init_lat, jnp.zeros((2,)), ctx, pooled, time_ids,
        ip_hidden_states=ip_tokens, ip_attn_bias=biases, ip_scale=0.6,
        dialog_bbox=dialog))(jax.random.key(2))

    latents0 = jax.random.normal(jax.random.key(3),
                                 (1, lh, lw, cfg.in_channels), jnp.float32)

    def run(scheduler, steps, interval):
        sampler = make_sampler(scheduler, steps)

        def go():
            return _denoise(unet, params, sampler, latents0, ctx, pooled,
                            time_ids, ip_tokens, biases, dialog,
                            jnp.asarray(7.5, jnp.float32),
                            jnp.asarray(0.6, jnp.float32), use_ip=True,
                            cache_interval=interval, cache_split=2)

        t0 = time.perf_counter()
        lat = go()
        float(jnp.sum(lat))                        # compile + barrier
        print(f"#   compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lat = go()
            float(jnp.sum(lat))
            best = min(best, time.perf_counter() - t0)
        return np.asarray(lat, np.float32), best

    legs = [("exact (euler 20, no cache)", "euler_discrete", 20, None),
            ("dpm12 (dpmsolver++ 12, no cache)", "dpmsolver++", 12, None),
            ("preview (dpmsolver++ 12, DeepCache N=2)", "dpmsolver++", 12, 2)]
    base_s = None
    for name, sched, steps, interval in legs:
        lat, s = run(sched, steps, interval)
        if base_s is None:
            base_s = s
        print(f"{name}: {s:.3f} s/panel denoise "
              f"({base_s / s:.2f}x vs exact)  latent std {lat.std():.3f}",
              flush=True)


if __name__ == "__main__":
    main()
