"""Stage-3 training: the SEED-X agent as character-feature adapter.

Functional re-design of ``scripts/train/train_mllm.py:330-420``: the diffusion
stack (VAE, encoders, Resampler, UNet) is FROZEN; only the agent (LoRA LLaMA +
input/output QwenResamplers) trains. Per step:

1. encode panel/noise/timesteps and character crops exactly like stage 2;
2. build the agent's image stream ``[source-char-block, target-char-block]``
   per sample (``arrange_mllm_input_image_embeds``, ``train_mllm.py:44-57``) —
   char blocks are the resampler output minus the dummy tokens;
3. agent forward → lm + rec losses (``seed_x.py:35-88``);
4. **insert** the agent's reconstructed char block over the UNet context's
   char tokens (``insert_mllm_output_image_embeds``, ``train_mllm.py:60-68``)
   so the diffusion MSE back-propagates through the agent;
5. ``loss = diffusion_mse + mllm_loss_weight * (lm_scale*lm + rec_scale*rec)``
   (``train_mllm.py:409-411``).

Trainable tree: ``{"llm", "input_resampler", "output_resampler"}``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from diffsensei_tpu.core.config import MangaConfig
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.models.unet import attention_levels, level_spatial_shape
from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias
from diffsensei_tpu.train import losses
from diffsensei_tpu.train.diffusion import (
    FrozenDiffusionStack, TrainState, _encode_latents, _encode_text,
    _sample_noise_and_t, _time_ids)


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    manga: MangaConfig
    mllm_loss_weight: float = 1.0
    remat_unet: bool = False


def make_stage3_step(unet, resampler, agent, schedule: DDPMSchedule,
                     cfg: Stage3Config) -> Callable:
    """Batch = stage-2 fields + target char crops + MLLM supervision:
      target_ip_pixel_values / target_magi_pixel_values: [B, I, 224, 224, 3];
      mllm_input_ids / mllm_labels: [B, L]; ids_cmp_mask / ids_gen_mask: [B, L];
      embeds_cmp_mask / embeds_gen_mask: [B, 2].

    Returns ``step(state, frozen, batch, rng)``. The frozen diffusion stack —
    including the frozen UNet (``frozen.unet_params``) and Resampler
    (``frozen.resampler_params``) — is a traced argument, never a closure
    (see :class:`FrozenDiffusionStack`: closed-over trees become multi-GB
    program constants).
    """
    manga = cfg.manga
    unet_apply = jax.checkpoint(unet.apply) if cfg.remat_unet else unet.apply

    def encode_chars(frozen, crops, magi_crops):
        clip_h, _ = frozen.image_encoder.apply(frozen.image_encoder_params,
                                               crops)
        _, magi_cls = frozen.magi_encoder.apply(frozen.magi_encoder_params,
                                                magi_crops)
        return jax.lax.stop_gradient(clip_h), jax.lax.stop_gradient(magi_cls)

    def loss_fn(params, frozen, batch, rng):
        b, i, s = batch["ip_exists"].shape
        d = manga.num_dummy_tokens
        iv = i * manga.num_vision_tokens

        latents = _encode_latents(frozen, batch["pixel_values"],
                                  jax.random.fold_in(rng, 0))
        noise, t, noisy = _sample_noise_and_t(schedule, latents,
                                              jax.random.fold_in(rng, 1))

        # frozen char encoding + frozen resampler (train_mllm.py:343-355)
        crops = batch["ip_pixel_values"].reshape(
            (b * i * s,) + batch["ip_pixel_values"].shape[3:])
        magi = batch["magi_pixel_values"].reshape(
            (b * i * s,) + batch["magi_pixel_values"].shape[3:])
        clip_h, magi_cls = encode_chars(frozen, crops, magi)
        p, dc = clip_h.shape[-2:]
        clip_h = clip_h.reshape(b, i, s, p, dc).transpose(0, 2, 1, 3, 4)
        magi_cls = magi_cls.reshape(b, i, s, -1).transpose(0, 2, 1, 3)
        image_embeds = resampler.apply(
            frozen.resampler_params, clip_h.reshape(b * s, i, p, dc),
            magi_cls.reshape(b * s, i, -1))
        image_embeds = jax.lax.stop_gradient(image_embeds)

        tcrops = batch["target_ip_pixel_values"].reshape(
            (b * i,) + batch["target_ip_pixel_values"].shape[2:])
        tmagi = batch["target_magi_pixel_values"].reshape(
            (b * i,) + batch["target_magi_pixel_values"].shape[2:])
        tclip_h, tmagi_cls = encode_chars(frozen, tcrops, tmagi)
        target_embeds = resampler.apply(
            frozen.resampler_params, tclip_h.reshape(b, i, p, dc),
            tmagi_cls.reshape(b, i, -1))
        target_embeds = jax.lax.stop_gradient(target_embeds)

        image_embeds = losses.mean_multiple_ip_embeds(
            image_embeds, batch["ip_exists"], d, i,
            manga.num_vision_tokens, b)               # [B, d+IV, D]

        # agent: [source block, target block] per sample (train_mllm.py:44-57)
        mllm_images = jnp.stack(
            [image_embeds[:, d:, :], target_embeds[:, d:, :]], axis=1)
        agent_batch = {
            "input_ids": batch["mllm_input_ids"],
            "labels": batch["mllm_labels"],
            "image_embeds": mllm_images,
            "embeds_cmp_mask": batch["embeds_cmp_mask"],
            "embeds_gen_mask": batch["embeds_gen_mask"],
            "ids_cmp_mask": batch["ids_cmp_mask"],
            "ids_gen_mask": batch["ids_gen_mask"],
        }
        agent_total, aux = agent.loss(params, agent_batch)

        # insert reconstruction over the char block (train_mllm.py:60-68,373)
        recon = aux["recon_image_embeds"]             # [B, IV, D]
        image_embeds = jnp.concatenate(
            [image_embeds[:, :d, :], recon.astype(image_embeds.dtype)], axis=1)

        ctx, pooled = _encode_text(frozen, batch["text_input_ids"],
                                   batch["text_input_ids_2"])
        lh, lw = latents.shape[1], latents.shape[2]
        biases = {
            level: build_ip_attention_bias(
                batch["ip_bbox"],
                *level_spatial_shape(unet.config, lh, lw, level),
                manga.num_vision_tokens, manga.num_dummy_tokens)
            for level in attention_levels(unet.config)
        }
        pred = unet_apply(frozen.unet_params, noisy, t.astype(jnp.float32), ctx,
                          pooled, _time_ids(batch),
                          ip_hidden_states=image_embeds, ip_attn_bias=biases,
                          ip_scale=1.0, dialog_bbox=batch["dialog_bbox"])
        loss_d = losses.diffusion_loss(pred, noise, batch.get("sample_mask"))
        total = loss_d + cfg.mllm_loss_weight * agent_total
        return total, {"loss_diffusion": loss_d,
                       "loss_lm": aux["lm_loss"],
                       "loss_rec": aux["rec_loss"],
                       "loss_mllm": agent_total}

    def step(state: TrainState, frozen: FrozenDiffusionStack, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng)
        return state.apply_gradients(grads), {**metrics, "loss": loss}

    step.loss_fn = loss_fn   # exposed for equivalence tests / diagnostics
    return step
