"""Benchmark a REAL stage-2 training step at SDXL scale on the chip.

`bench_train_step.py` times the UNet fwd+bwd alone; the reference's stage-2
step also pays, in-loop: fp32 VAE encode, CLIP-H + Magi over b·I·S character
crops, dual text encoders, the trainable Resampler, loss and the AdamW update
(``scripts/train/train.py:336-426``). This times the whole
``make_stage2_step`` product under the default 'new' selection mode
(partitioned trainable subtree — what the CLI runs), i.e. the per-chip cost
of a production fine-tune step (VERDICT r2 weak #1, second half).

Usage: python tools/bench_stage2_step.py
Env: BENCH_TRAIN_RES (1024), BENCH_TRAIN_BATCH (1), BENCH_TRAIN_MODE (new).
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
    from diffsensei_tpu.models.schedulers import DDPMSchedule
    from diffsensei_tpu.pipelines.pipeline import PipelineModules
    from diffsensei_tpu.train.diffusion import (
        FrozenDiffusionStack, Stage2Config, TrainState, make_stage2_step)
    from diffsensei_tpu.train.optim import (
        make_optimizer, partition_params, unet_trainable_mask)
    from diffsensei_tpu.utils.observability import device_memory_stats

    res = int(os.environ.get("BENCH_TRAIN_RES", "1024"))
    b = int(os.environ.get("BENCH_TRAIN_BATCH", "1"))
    mode = os.environ.get("BENCH_TRAIN_MODE", "new")
    dtype = jnp.bfloat16

    t0 = time.perf_counter()
    policy = os.environ.get("REMAT_POLICY") or None
    # bf16 param trees from the start: the single-chip training configuration
    # (fp32 zeros trees for the full stack are ~18 GB and OOM before the cast)
    modules = PipelineModules.sdxl(init="zeros", dtype=dtype, remat=True,
                                   remat_policy=policy, param_dtype=dtype)
    print(f"build+zeros init: {time.perf_counter()-t0:.1f}s "
          f"mem={device_memory_stats()}", flush=True)

    manga = modules.manga
    frozen = FrozenDiffusionStack(
        vae=modules.vae, vae_params=modules.vae_params,
        text_encoder=modules.text_encoder,
        text_encoder_params=modules.text_encoder_params,
        text_encoder_2=modules.text_encoder_2,
        text_encoder_2_params=modules.text_encoder_2_params,
        image_encoder=modules.image_encoder,
        image_encoder_params=modules.image_encoder_params,
        magi_encoder=modules.magi_encoder,
        magi_encoder_params=modules.magi_encoder_params,
        vae_scaling=modules.vae.config.scaling_factor)
    s2 = Stage2Config(manga=manga, max_num_sources=1)

    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               DDPMSchedule(), s2)
    if mode == "full":
        params = {"unet": modules.unet_params,
                  "resampler": modules.resampler_params}
    else:
        umask = unet_trainable_mask(modules.unet_params, mode)
        t_flat, f_flat = partition_params(modules.unet_params, umask)
        frozen = frozen.replace(unet_frozen_flat=f_flat)
        params = {"unet": t_flat, "resampler": modules.resampler_params}
    n_train = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"mode={mode}: {n_train/1e6:.1f}M trainable params", flush=True)

    state = TrainState.create(params, make_optimizer(1e-4))
    i, s = manga.max_num_ips, 1
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (b, res, res, 3)), jnp.float32),
        "text_input_ids": jnp.zeros((b, 77), jnp.int32),
        "text_input_ids_2": jnp.zeros((b, 77), jnp.int32),
        "ip_pixel_values": jnp.zeros((b, i, s, 224, 224, 3), jnp.float32),
        "magi_pixel_values": jnp.zeros((b, i, s, 224, 224, 3), jnp.float32),
        "ip_exists": jnp.ones((b, i, s), jnp.float32),
        "ip_bbox": jnp.asarray(rng.uniform(0, 1, (b, i, 4)), jnp.float32),
        "dialog_bbox": jnp.zeros((b, manga.max_num_dialogs, 4), jnp.float32),
        "original_size": jnp.full((b, 2), float(res)),
        "crop_coords_top_left": jnp.zeros((b, 2)),
        "target_size": jnp.full((b, 2), float(res)),
    }

    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = jit_step(state, frozen, batch, jax.random.key(1))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f} mem={device_memory_stats()}",
          flush=True)

    times = []
    for k in range(4):
        t0 = time.perf_counter()
        state, metrics = jit_step(state, frozen, batch, jax.random.key(2 + k))
        float(metrics["loss"])         # host fetch = execution barrier
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"stage-2 full step p50: {times[len(times)//2]*1000:.1f} ms "
          f"(batch {b}, {res}^2, mode={mode}, bf16, remat policy={policy}) "
          f"reps={[f'{x*1000:.1f}' for x in times]} "
          f"mem={device_memory_stats()}")


if __name__ == "__main__":
    main()
