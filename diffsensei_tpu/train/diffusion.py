"""Diffusion training steps: stage 1 (t2i) and stage 2 (condition).

Functional re-design of the reference train loops:

* stage 1 — plain SDXL epsilon-MSE fine-tune on manga panels
  (``scripts/train/train_t2i.py:258-303``);
* stage 2 — adds the IP machinery: frozen CLIP/Magi character encoding, the
  trainable Resampler, source-mean embedding, optional contrastive loss, and
  the manga UNet with bbox conditioning (``scripts/train/train.py:336-426``).

Each step is one pure function ``(state, frozen, batch, rng) -> (state, metrics)``
jitted/pjit-ed over the (data, model) mesh: batch leaves shard on ``data``;
params replicate (the reference's DDP, SURVEY.md §2.5) so the psum XLA inserts
for the gradient mean IS the NCCL all-reduce equivalent. Gradient accumulation
uses ``optax.MultiSteps`` (reference ``accelerator.accumulate``, ``train.py:336``);
activation rematerialization comes from ``jax.checkpoint`` over the UNet apply.

Unlike the reference, the trainable subtree is explicit: ``TrainState.params``
holds ONLY what trains (UNet [+ Resampler]); frozen encoders live in
``FrozenDiffusionStack`` outside the differentiated arguments, so no wasted
backward FLOPs and no requires_grad bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diffsensei_tpu.core.config import MangaConfig
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.models.unet import attention_levels, level_spatial_shape
from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias
from diffsensei_tpu.train import losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                        # trainable subtree only
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=opt_state)


class FrozenDiffusionStack(struct.PyTreeNode):
    """Frozen modules + params used by the train step (no grads flow here).

    A PYTREE: the param trees are leaves so the stack is passed to the jitted
    step as a traced ARGUMENT, never a closure. Closing over multi-GB frozen
    trees bakes them into the jaxpr as constants — XLA then materializes a
    second on-device copy of every frozen encoder (8.3 GB at SDXL scale,
    measured OOM on a 16 GB v5e). Module objects and ``vae_scaling`` are
    static metadata (hashable; changing them retraces).

    ``unet_params``/``resampler_params`` carry the stage-3 frozen diffusion
    stack; ``unet_frozen_flat`` carries the non-trainable flat UNet subtree of
    stage-2 partitioned modes (``optim.partition_params``).
    """

    vae_params: Any = None
    text_encoder_params: Any = None
    text_encoder_2_params: Any = None
    image_encoder_params: Any = None
    magi_encoder_params: Any = None
    unet_params: Any = None
    resampler_params: Any = None
    unet_frozen_flat: Any = None
    vae: Any = struct.field(pytree_node=False, default=None)
    text_encoder: Any = struct.field(pytree_node=False, default=None)
    text_encoder_2: Any = struct.field(pytree_node=False, default=None)
    image_encoder: Any = struct.field(pytree_node=False, default=None)
    magi_encoder: Any = struct.field(pytree_node=False, default=None)
    vae_scaling: float = struct.field(pytree_node=False, default=0.13025)


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    manga: MangaConfig
    max_num_sources: int = 2
    ip_contrastive: Optional[str] = None        # None | "fast" | "slow"
    ip_contrastive_weight: float = 0.1
    snr_clip: Optional[float] = None            # reserved (reference: plain MSE)
    remat_unet: bool = False
    # True: Perceiver Resampler over patch features (released DiffSensei);
    # False: linear ImageProjDummyModel over pooled features (the
    # ip_adapter_plus: false path, reference train.py:357-360)
    ip_adapter_plus: bool = True


def _encode_text(frozen: FrozenDiffusionStack, ids, ids_2):
    h1, _ = frozen.text_encoder.apply(frozen.text_encoder_params, ids)
    h2, pooled = frozen.text_encoder_2.apply(frozen.text_encoder_2_params, ids_2)
    return jnp.concatenate([h1, h2], axis=-1), pooled


def _encode_latents(frozen: FrozenDiffusionStack, pixel_values, rng):
    mean, logvar = frozen.vae.apply(frozen.vae_params, pixel_values,
                                    method=frozen.vae.encode)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape,
                                                         mean.dtype)
    return z * frozen.vae_scaling


def _sample_noise_and_t(schedule: DDPMSchedule, latents, rng):
    rng_n, rng_t = jax.random.split(rng)
    noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
    t = jax.random.randint(rng_t, (latents.shape[0],), 0,
                           schedule.num_train_timesteps)
    return noise, t, schedule.add_noise(latents, noise, t)


def _panel_count(batch) -> jnp.ndarray:
    """Real (non-padded) panels in the batch: sum of the loss mask, or the
    full batch size when the collate produced no padding. Logged per step so
    throughput tooling reads panels/s exactly instead of inferring batch
    composition from step times (which fails when the per-bucket step times
    coincide — see tools/bench_sustained_train.py)."""
    mask = batch.get("sample_mask")
    if mask is not None:
        return jnp.sum(mask)
    return jnp.asarray(float(batch["pixel_values"].shape[0]), jnp.float32)


def _time_ids(batch) -> jnp.ndarray:
    """SDXL micro-conditioning [orig_hw, crop_tl, target_hw] (train.py:399-404)."""
    return jnp.concatenate(
        [batch["original_size"], batch["crop_coords_top_left"],
         batch["target_size"]], axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Stage 1: t2i fine-tune (train_t2i.py)
# ---------------------------------------------------------------------------
def make_stage1_step(unet, schedule: DDPMSchedule,
                     remat_unet: bool = False) -> Callable:
    """Returns ``step(state, frozen, batch, rng) -> (state, metrics)`` —
    ``frozen`` is a :class:`FrozenDiffusionStack` traced argument (see its
    docstring for why it must not be closed over)."""
    unet_apply = jax.checkpoint(unet.apply) if remat_unet else unet.apply

    def loss_fn(params, frozen, batch, rng):
        latents = _encode_latents(frozen, batch["pixel_values"],
                                  jax.random.fold_in(rng, 0))
        noise, t, noisy = _sample_noise_and_t(schedule, latents,
                                              jax.random.fold_in(rng, 1))
        ctx, pooled = _encode_text(frozen, batch["text_input_ids"],
                                   batch["text_input_ids_2"])
        pred = unet_apply(params, noisy, t.astype(jnp.float32), ctx, pooled,
                          _time_ids(batch))
        loss = losses.diffusion_loss(pred, noise, batch.get("sample_mask"))
        return loss, {"loss_diffusion": loss}

    def step(state: TrainState, frozen: FrozenDiffusionStack, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng)
        return state.apply_gradients(grads), {
            **metrics, "loss": loss, "panels": _panel_count(batch)}

    step.loss_fn = loss_fn   # exposed for equivalence tests / diagnostics
    return step


# ---------------------------------------------------------------------------
# Stage 2: IP-conditioned training (train.py)
# ---------------------------------------------------------------------------
def make_stage2_step(unet, resampler, schedule: DDPMSchedule,
                     cfg: Stage2Config) -> Callable:
    """Trainable params tree: ``{"unet": ..., "resampler": ...}``.

    Returns ``step(state, frozen, batch, rng)``; ``frozen`` is a traced
    argument (never closed over — see :class:`FrozenDiffusionStack`).

    With ``frozen.unet_frozen_flat`` set (from ``optim.partition_params``),
    the state's ``params["unet"]`` holds ONLY the trainable flat subtree and
    frozen UNet weights ride the frozen stack — gradients are never allocated
    for them (~5 GB saved at SDXL scale under the default 'new' selection
    mode), and no optax masking is needed.

    Expected batch (shapes per SURVEY §2.3, collate at
    ``dataset_size_bucket.py:303-334``):
      pixel_values [B,H,W,3]; text_input_ids / _2 [B,77];
      ip_pixel_values [B, I, S, 224, 224, 3]; magi_pixel_values same;
      ip_exists [B, I, S]; ip_bbox [B, I, 4]; dialog_bbox [B, Dlg, 4];
      original_size / crop_coords_top_left / target_size [B, 2].
    """
    manga = cfg.manga
    unet_apply = jax.checkpoint(unet.apply) if cfg.remat_unet else unet.apply

    def _unet_params(params, frozen):
        if frozen.unet_frozen_flat is None:
            return params["unet"]
        from diffsensei_tpu.train.optim import merge_partitioned
        return merge_partitioned(params["unet"], frozen.unet_frozen_flat)

    def loss_fn(params, frozen, batch, rng):
        b, i, s = batch["ip_exists"].shape

        latents = _encode_latents(frozen, batch["pixel_values"],
                                  jax.random.fold_in(rng, 0))
        noise, t, noisy = _sample_noise_and_t(schedule, latents,
                                              jax.random.fold_in(rng, 1))

        # frozen character encoders over all B*I*S crops (train.py:356-367)
        crops = batch["ip_pixel_values"].reshape((b * i * s,) +
                                                 batch["ip_pixel_values"].shape[3:])
        magi_crops = batch["magi_pixel_values"].reshape(
            (b * i * s,) + batch["magi_pixel_values"].shape[3:])
        clip_h, clip_cls = frozen.image_encoder.apply(
            frozen.image_encoder_params, crops)
        _, magi_cls = frozen.magi_encoder.apply(frozen.magi_encoder_params,
                                                magi_crops)
        clip_h = jax.lax.stop_gradient(clip_h)
        clip_cls = jax.lax.stop_gradient(clip_cls)
        magi_cls = jax.lax.stop_gradient(magi_cls)
        # regroup [B,I,S,...] -> sources-major [B*S, I, ...] (train.py:362)
        magi_cls = magi_cls.reshape(b, i, s, -1).transpose(0, 2, 1, 3)
        magi_cls = magi_cls.reshape(b * s, i, -1)

        if cfg.ip_adapter_plus:
            # trainable Perceiver resampler over patch features (train.py:369)
            p, d_clip = clip_h.shape[-2:]
            clip_h = clip_h.reshape(b, i, s, p, d_clip).transpose(0, 2, 1, 3, 4)
            clip_h = clip_h.reshape(b * s, i, p, d_clip)
            image_embeds = resampler.apply(params["resampler"], clip_h,
                                           magi_cls)
        else:
            # linear ImageProjDummyModel over pooled features (the
            # ip_adapter_plus: false path, train.py:357-360)
            clip_cls = clip_cls.reshape(b, i, s, -1).transpose(0, 2, 1, 3)
            clip_cls = clip_cls.reshape(b * s, i, -1)
            image_embeds = resampler.apply(params["resampler"], clip_cls,
                                           magi_cls)

        # contrastive loss on character blocks (train.py:372-377; the
        # reconstructed component — see losses.ip_contrastive_loss)
        if cfg.ip_contrastive == "fast":
            loss_c = losses.ip_contrastive_loss(
                image_embeds[:, manga.num_dummy_tokens:, :],
                batch["ip_exists"], b, i, manga.num_vision_tokens)
        elif cfg.ip_contrastive == "slow":
            loss_c = losses.ip_contrastive_loss_slow(
                image_embeds[:, manga.num_dummy_tokens:, :],
                batch["ip_exists"], b, i, manga.num_vision_tokens)
        else:
            loss_c = jnp.asarray(0.0, jnp.float32)

        # source-mean (train.py:380) then zero out nonexistent characters
        ip_tokens = losses.mean_multiple_ip_embeds(
            image_embeds, batch["ip_exists"], manga.num_dummy_tokens,
            i, manga.num_vision_tokens, b)
        any_source = (batch["ip_exists"].sum(-1) > 0).astype(ip_tokens.dtype)
        char_mask = jnp.repeat(any_source, manga.num_vision_tokens, axis=1)
        keep = jnp.concatenate(
            [jnp.ones((b, manga.num_dummy_tokens), ip_tokens.dtype), char_mask],
            axis=1)
        ip_tokens = ip_tokens * keep[..., None]

        ctx, pooled = _encode_text(frozen, batch["text_input_ids"],
                                   batch["text_input_ids_2"])

        # masked-IP biases per attention level, hoisted (vs per-layer rebuild
        # at attention_processor.py:243)
        lh, lw = latents.shape[1], latents.shape[2]
        biases = {
            level: build_ip_attention_bias(
                batch["ip_bbox"],
                *level_spatial_shape(unet.config, lh, lw, level),
                manga.num_vision_tokens, manga.num_dummy_tokens)
            for level in attention_levels(unet.config)
        }

        pred = unet_apply(_unet_params(params, frozen), noisy,
                          t.astype(jnp.float32),
                          ctx, pooled, _time_ids(batch),
                          ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                          ip_scale=1.0, dialog_bbox=batch["dialog_bbox"])

        loss_d = losses.diffusion_loss(pred, noise, batch.get("sample_mask"))
        loss = loss_d + cfg.ip_contrastive_weight * loss_c
        return loss, {"loss_diffusion": loss_d, "loss_ip_contrastive": loss_c}

    def step(state: TrainState, frozen: FrozenDiffusionStack, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng)
        return state.apply_gradients(grads), {
            **metrics, "loss": loss, "panels": _panel_count(batch)}

    step.loss_fn = loss_fn   # exposed for equivalence tests / diagnostics
    return step
