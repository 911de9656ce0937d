"""DiffSensei inference pipeline: prompt → manga panel, fully jitted on TPU.

Public surface mirrors the reference ``DiffSenseiPipeline.__call__``
(``src/pipelines/pipeline_diffsensei.py:181-203``): prompt / negative prompt,
height/width, ``num_inference_steps``, ``guidance_scale``, ``num_samples``,
``ip_images`` XOR ``ip_image_embeds`` (the MLLM paste-over path, reference
``:143-145``), ``ip_bbox``, ``ip_scale``, ``dialog_bbox``, seeded randomness.

TPU-first structure (vs the reference's per-step Python loop):

* the whole denoise loop — CFG batch doubling, UNet forward, guidance combine,
  scheduler step — is ONE jitted function driven by ``lax.fori_loop``
  (reference loops in Python with host sync per step, ``:310-337``);
* masked-IP attention biases are computed once per call per UNet attention level
  (reference rebuilds them per layer per step, ``attention_processor.py:243``);
* free-form H/W snaps to the bucket grid by default (``core/buckets.snap_to_bucket``)
  so serving hits a bounded set of compiled programs; the reference's
  multiple-of-8 snap (``:208-210``, which is also a no-op bug — float division) is
  available with ``snap_to_buckets=False``;
* one compiled program per (bucket, batch, steps) key, cached by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.core.buckets import snap_to_bucket
from diffsensei_tpu.core.config import (
    MangaConfig,
    PipelineConfig,
    ResamplerConfig,
    TextEncoderConfig,
    UNetConfig,
    VAEConfig,
    VisionEncoderConfig,
)
from diffsensei_tpu.models.resampler import Resampler
from diffsensei_tpu.models.schedulers import (
    SamplerState,
    make_sampler,
    multistep_step,
    scale_model_input,
    step as scheduler_step,
)
from diffsensei_tpu.models.text_encoder import CLIPTextEncoder
from diffsensei_tpu.models.unet import (UNetMangaModel, attention_levels,
                                         level_spatial_shape)
from diffsensei_tpu.models.vae import AutoencoderKL
from diffsensei_tpu.models.vision_encoder import VisionTransformer
from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

@dataclasses.dataclass
class PipelineModules:
    """Model definitions + parameter pytrees for every pipeline stage."""

    unet: UNetMangaModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextEncoder
    text_encoder_params: Any
    text_encoder_2: CLIPTextEncoder
    text_encoder_2_params: Any
    image_encoder: Optional[VisionTransformer] = None
    image_encoder_params: Any = None
    magi_encoder: Optional[VisionTransformer] = None
    magi_encoder_params: Any = None
    resampler: Optional[Resampler] = None
    resampler_params: Any = None
    tokenizer: Any = None      # callable(str) -> [77] ids, or HF tokenizer
    tokenizer_2: Any = None

    @property
    def manga(self) -> MangaConfig:
        return self.unet.config.manga

    @classmethod
    def tiny(cls, rng: jax.Array, lora_rank: int = 0) -> "PipelineModules":
        """CPU-testable tiny stack with matching cross-dims (no tokenizers)."""
        manga = MangaConfig(max_num_ips=2, num_vision_tokens=4,
                            num_dummy_tokens=4, max_num_dialogs=3)
        ucfg = dataclasses.replace(UNetConfig.tiny(manga),
                                   lora_rank=lora_rank)
        vcfg = VAEConfig.tiny()
        # two text encoders whose hidden sizes sum to cross_attention_dim
        t1 = dataclasses.replace(TextEncoderConfig.tiny(), hidden_size=16,
                                 intermediate_size=32)
        t2 = dataclasses.replace(
            TextEncoderConfig.tiny(projection_dim=ucfg.pooled_projection_dim),
            hidden_size=ucfg.cross_attention_dim - t1.hidden_size)
        icfg = VisionEncoderConfig.tiny()
        mcfg = dataclasses.replace(VisionEncoderConfig.tiny(), hidden_size=16)
        rcfg = dataclasses.replace(
            ResamplerConfig.tiny(manga),
            embedding_dim=icfg.hidden_size, magi_embedding_dim=mcfg.hidden_size,
            output_dim=ucfg.cross_attention_dim)

        keys = jax.random.split(rng, 7)
        unet = UNetMangaModel(ucfg)
        vae = AutoencoderKL(vcfg)
        te1, te2 = CLIPTextEncoder(t1), CLIPTextEncoder(t2)
        ienc, menc = VisionTransformer(icfg), VisionTransformer(mcfg)
        res = Resampler(rcfg)

        ids = jnp.zeros((1, 77), jnp.int32)
        img = jnp.zeros((1, 224, 224, 3), jnp.float32)
        lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
        unet_params = unet.init(
            keys[0], lat, jnp.zeros((1,)), jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1, ucfg.pooled_projection_dim)), jnp.zeros((1, 6)),
            ip_hidden_states=jnp.zeros(
                (1, manga.num_context_image_tokens, ucfg.cross_attention_dim)))
        return cls(
            unet=unet, unet_params=unet_params,
            vae=vae, vae_params=vae.init(keys[1], jnp.zeros((1, 32, 32, 3)),
                                         keys[2]),
            text_encoder=te1, text_encoder_params=te1.init(keys[3], ids),
            text_encoder_2=te2, text_encoder_2_params=te2.init(keys[4], ids),
            image_encoder=ienc, image_encoder_params=ienc.init(keys[5], img),
            magi_encoder=menc, magi_encoder_params=menc.init(keys[6], img),
            resampler=res, resampler_params=res.init(
                jax.random.fold_in(rng, 9),
                jnp.zeros((1, manga.max_num_ips, icfg.seq_len, icfg.hidden_size)),
                jnp.zeros((1, manga.max_num_ips, mcfg.hidden_size))),
        )

    @classmethod
    def sdxl(cls, rng: Optional[jax.Array] = None,
             dtype: Any = jnp.bfloat16, init: str = "zeros",
             remat: bool = False, lora_rank: int = 0,
             remat_policy: Optional[str] = None,
             param_dtype: Any = jnp.float32) -> "PipelineModules":
        """Production-scale stack (reference ``gradio.py:229-283`` geometry):
        SDXL UNet + manga modules, fp32 VAE, CLIP-L + OpenCLIP-bigG text
        encoders, CLIP ViT-H + Magi ViTMAE image encoders, DiffSensei
        Resampler.

        ``init``: "zeros" (``eval_shape``-based trees, no RNG/compile —
        overlay ported weights before serving; ~7 min CPU trace for the full
        unrolled UNet, same order as any init of this graph), "random"
        (full random init; for benchmarks/training-from-scratch), or "none"
        (module defs only, params left ``None``).
        Params default fp32; compute dtype ``dtype`` (VAE always fp32).
        ``param_dtype=jnp.bfloat16`` builds the param trees directly in bf16
        — the single-chip training configuration (an fp32-then-cast pass
        transiently doubles the 10.4 GB UNet tree and OOMs a 16 GB chip).
        """
        manga = MangaConfig()
        ucfg = dataclasses.replace(UNetConfig.sdxl(manga),
                                   lora_rank=lora_rank)
        pkw = dict(dtype=dtype, param_dtype=param_dtype)
        unet = UNetMangaModel(ucfg, remat_blocks=remat,
                              remat_policy=remat_policy, **pkw)
        vae = AutoencoderKL(VAEConfig.sdxl())          # always fp32
        te1 = CLIPTextEncoder(TextEncoderConfig.clip_l(), **pkw)
        te2 = CLIPTextEncoder(TextEncoderConfig.clip_bigg(), **pkw)
        icfg = VisionEncoderConfig.clip_vit_h()
        mcfg = VisionEncoderConfig.magi_vitmae()
        ienc = VisionTransformer(icfg, **pkw)
        menc = VisionTransformer(mcfg, **pkw)
        res = Resampler(ResamplerConfig.diffsensei(), **pkw)

        mods = cls(unet=unet, unet_params=None, vae=vae, vae_params=None,
                   text_encoder=te1, text_encoder_params=None,
                   text_encoder_2=te2, text_encoder_2_params=None,
                   image_encoder=ienc, image_encoder_params=None,
                   magi_encoder=menc, magi_encoder_params=None,
                   resampler=res, resampler_params=None)
        if init == "none":
            return mods

        for name, (fn, *args) in mods._init_specs(rng, dtype).items():
            if init == "zeros":
                shapes = jax.eval_shape(fn, *args)
                tree = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            else:
                tree = fn(*args)
            setattr(mods, name, tree)
        return mods

    def _init_specs(self, rng: Optional[jax.Array], dtype: Any):
        """Per-component ``field -> (init_fn, *args)`` for this module set."""
        manga = self.manga
        ucfg = self.unet.config
        rng = rng if rng is not None else jax.random.key(0)
        keys = jax.random.split(rng, 7)
        ids = jnp.zeros((1, 77), jnp.int32)
        img = jnp.zeros((1, 224, 224, 3), jnp.float32)
        lh = lw = 64
        biases = {
            level: jnp.zeros((1, (lh >> level) * (lw >> level),
                              manga.num_context_image_tokens), dtype)
            for level in attention_levels(ucfg)
        }
        unet_init = functools.partial(
            self.unet.init,
            ip_hidden_states=jnp.zeros(
                (1, manga.num_context_image_tokens, ucfg.cross_attention_dim),
                dtype),
            ip_attn_bias=biases, ip_scale=0.6,
            dialog_bbox=jnp.zeros((1, manga.max_num_dialogs, 4)))
        rcfg = self.resampler.config
        return {
            "unet_params": (unet_init, keys[0],
                            jnp.zeros((1, lh, lw, ucfg.in_channels), dtype),
                            jnp.zeros((1,)),
                            jnp.zeros((1, 77, ucfg.cross_attention_dim), dtype),
                            jnp.zeros((1, ucfg.pooled_projection_dim), dtype),
                            jnp.zeros((1, 6))),
            "vae_params": (self.vae.init, keys[1], jnp.zeros((1, 64, 64, 3)),
                           keys[2]),
            "text_encoder_params": (self.text_encoder.init, keys[3], ids),
            "text_encoder_2_params": (self.text_encoder_2.init, keys[4], ids),
            "image_encoder_params": (self.image_encoder.init, keys[5], img),
            "magi_encoder_params": (self.magi_encoder.init, keys[6], img),
            "resampler_params": (
                self.resampler.init, jax.random.fold_in(rng, 9),
                jnp.zeros((1, manga.max_num_ips,
                           self.image_encoder.config.seq_len,
                           rcfg.embedding_dim)),
                jnp.zeros((1, manga.max_num_ips, rcfg.magi_embedding_dim))),
        }

    def fill_missing_params(self, rng: Optional[jax.Array] = None) -> None:
        """Zero-init ONLY the components whose params are still ``None``.

        Serving fast path: build with ``init="none"``, overlay ported
        checkpoints (the porters construct complete trees themselves), then
        call this — skipping the ~7 min UNet init trace whenever a full UNet
        checkpoint was provided.
        """
        for field, (fn, *args) in self._init_specs(
                rng, self.unet.dtype).items():
            if getattr(self, field) is None:
                shapes = jax.eval_shape(fn, *args)
                setattr(self, field, jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes))


# ---------------------------------------------------------------------------
# Jitted core: the denoising loop (one compile per shape/step-count key)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("unet", "use_ip",
                                              "cache_interval", "cache_split"))
def _denoise(unet: UNetMangaModel, unet_params, sampler: SamplerState,
             latents, ctx, pooled, time_ids, ip_tokens, ip_biases,
             dialog_bbox, guidance_scale, ip_scale, *, use_ip: bool,
             cache_interval: Optional[int] = None, cache_split: int = 2):
    """CFG denoise: all conditioning arrives pre-doubled [neg; pos] on axis 0.

    ``cache_interval=N`` enables DeepCache-style serving: the UNet's deep
    subtree (levels >= ``cache_split`` + mid) recomputes only every N-th step
    and is reused in between via ``lax.cond`` — both step variants live in
    the ONE compiled loop program. N=1 is bit-identical to no caching; N>1
    is an approximation (opt-in quality/speed knob)."""

    def _apply(lat_in, t, **kwargs):
        return unet.apply(
            unet_params, lat_in, t, ctx, pooled, time_ids,
            ip_hidden_states=ip_tokens if use_ip else None,
            ip_attn_bias=ip_biases if use_ip else None,
            ip_scale=ip_scale,
            dialog_bbox=dialog_bbox, **kwargs)

    def cfg_eps(i, lat, deep=None):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        lat_in = scale_model_input(sampler, lat_in, i)
        t = jnp.broadcast_to(sampler.timesteps[i], (lat_in.shape[0],))
        if cache_interval is None:
            eps, new_deep = _apply(lat_in, t), None
        else:
            def full(args):
                lat_in, deep = args
                eps, g = _apply(lat_in, t, return_deep=True,
                                cache_split=cache_split)
                return eps, g.astype(deep.dtype)

            def cached(args):
                lat_in, deep = args
                eps = _apply(lat_in, t, deep_feature=deep,
                             cache_split=cache_split)
                return eps, deep

            eps, new_deep = jax.lax.cond(i % cache_interval == 0,
                                         full, cached, (lat_in, deep))
        eps_neg, eps_pos = jnp.split(eps, 2, axis=0)
        return eps_neg + guidance_scale * (eps_pos - eps_neg), new_deep

    deep0 = None
    if cache_interval is not None:
        cfgm = unet.config
        dh, dw = level_spatial_shape(cfgm, latents.shape[1], latents.shape[2],
                                     cache_split - 1)
        deep0 = jnp.zeros((2 * latents.shape[0], dh, dw,
                           cfgm.block_out_channels[cache_split]), unet.dtype)

    if sampler.is_multistep:
        # DPM-Solver++ (2M): the loop additionally carries the previous x0
        def body(i, carry):
            lat, prev_x0, deep = carry
            eps, new_deep = cfg_eps(i, lat, deep)
            lat, prev_x0 = multistep_step(sampler, eps, i, lat, prev_x0)
            return lat, prev_x0, new_deep

        final, _, _ = jax.lax.fori_loop(
            0, sampler.num_steps, body,
            (latents, jnp.zeros_like(latents), deep0))
        return final

    def body(i, carry):
        lat, deep = carry
        eps, new_deep = cfg_eps(i, lat, deep)
        return scheduler_step(sampler, eps, i, lat), new_deep

    final, _ = jax.lax.fori_loop(0, sampler.num_steps, body,
                                 (latents, deep0))
    return final


@functools.partial(jax.jit, static_argnames=("vae",))
def _decode(vae: AutoencoderKL, vae_params, latents, scaling_factor):
    z = latents.astype(jnp.float32) / scaling_factor
    img = vae.apply(vae_params, z, method=vae.decode)
    return jnp.clip(img / 2 + 0.5, 0.0, 1.0)


def _decode_any(vae: AutoencoderKL, vae_params, latents, scaling_factor):
    """fp32 decode; >1024px panels go through the HOST-looped tiled decoder
    (one tile resident at a time — see models/vae.tiled_decode)."""
    if latents.shape[1] > 128 or latents.shape[2] > 128:
        from diffsensei_tpu.models.vae import tiled_decode

        z = latents.astype(jnp.float32) / scaling_factor
        img = tiled_decode(vae, vae_params, z)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)
    return _decode(vae, vae_params, latents, scaling_factor)


class DiffSenseiPipeline:
    """End-to-end manga panel generation (wo-MLLM and MLLM paste-over paths)."""

    def __init__(self, modules: PipelineModules,
                 config: PipelineConfig = PipelineConfig(),
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — batched serving shards
        the CFG batch (2 * num_samples) over the ``data`` axis, the
        multi-chip bucketed-batch inference mode (BASELINE.md config #5).
        The reference has no multi-device inference (SURVEY.md §3.1).

        ``config.context_parallel`` (with a mesh) instead shards the SPATIAL
        sequence of the big self-attentions over the data axis via ring-flash
        attention (``ops/ring_attention.py``) — the single-panel 2048²-class
        serving mode (SURVEY §5 long-context). Batch sharding is skipped in
        this mode (the same axis carries the sequence)."""
        self.m = modules
        self.config = config
        self.mesh = mesh
        if config.context_parallel and mesh is not None:
            self.m = dataclasses.replace(
                modules,
                unet=modules.unet.clone(
                    cp_mesh=mesh,
                    cp_min_seq=config.context_parallel_min_seq))
        self.vae_scaling = self.m.vae.config.scaling_factor
        self.latent_scale = self.m.vae.config.downscale_factor

    def _shard(self, tree, batched_axis0: bool = True):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        from diffsensei_tpu.parallel.mesh import DATA_AXIS
        spec = P(DATA_AXIS) if batched_axis0 else P()
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(self.mesh, spec))
            if hasattr(x, "shape") and x.ndim > 0 else x, tree)

    # -- prompt encoding (reference inherits SDXL encode_prompt, :232-245) ----
    def _tokenize(self, tokenizer, text: str) -> jnp.ndarray:
        if tokenizer is None:
            raise ValueError("pipeline built without tokenizers; pass token ids")
        out = tokenizer(text, padding="max_length", max_length=77,
                        truncation=True, return_tensors="np")
        return jnp.asarray(out["input_ids"], jnp.int32)

    def encode_prompt(self, prompt: str, negative_prompt: str = "",
                      ids: Optional[jnp.ndarray] = None,
                      neg_ids: Optional[jnp.ndarray] = None,
                      ids_2: Optional[jnp.ndarray] = None,
                      neg_ids_2: Optional[jnp.ndarray] = None,
                      prompt_2: Optional[str] = None,
                      negative_prompt_2: Optional[str] = None):
        """Returns (ctx [2, 77, D_cross], pooled [2, P]) with row 0 = negative.

        ``prompt_2``/``negative_prompt_2`` feed the second (OpenCLIP-bigG)
        encoder separately (SDXL dual-prompt surface, reference
        ``pipeline_diffsensei.py:181-203``); default to the primary prompts.
        """
        if ids is None:
            ids = self._tokenize(self.m.tokenizer, prompt)
            neg_ids = self._tokenize(self.m.tokenizer, negative_prompt)
        if ids_2 is None:
            tok2 = self.m.tokenizer_2 or self.m.tokenizer
            if self.m.tokenizer_2 is None and self.m.tokenizer is None:
                ids_2, neg_ids_2 = ids, neg_ids
            else:
                ids_2 = self._tokenize(
                    tok2, prompt if prompt_2 is None else prompt_2)
                neg_ids_2 = self._tokenize(
                    tok2, negative_prompt if negative_prompt_2 is None
                    else negative_prompt_2)
        both = jnp.concatenate([neg_ids, ids], axis=0)
        both_2 = jnp.concatenate([neg_ids_2, ids_2], axis=0)
        h1, _ = self.m.text_encoder.apply(self.m.text_encoder_params, both)
        h2, pooled = self.m.text_encoder_2.apply(
            self.m.text_encoder_2_params, both_2)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        return ctx, pooled

    def check_inputs(self, prompt, ip_pixel_values, ip_image_embeds, ip_bbox,
                     dialog_bbox, num_samples):
        """Input contract (reference ``check_inputs``, ``:81-102``): string
        prompt, characters need bboxes, bbox counts within budget. Unlike the
        reference, embeds+pixels together are allowed (embeds paste over)."""
        manga = self.m.manga
        if prompt is not None and not isinstance(prompt, str):
            raise ValueError(f"prompt must be a string, got {type(prompt)}")
        if num_samples < 1:
            raise ValueError("num_samples must be >= 1")
        n_chars = 0
        if ip_pixel_values is not None:
            n_chars = ip_pixel_values.shape[0]
            if n_chars > manga.max_num_ips:
                raise ValueError(
                    f"{n_chars} character images > max_num_ips="
                    f"{manga.max_num_ips}")
        if ip_image_embeds is not None:
            if ip_image_embeds.shape[-2] % manga.num_vision_tokens:
                raise ValueError(
                    "ip_image_embeds token count must be a multiple of "
                    f"num_vision_tokens={manga.num_vision_tokens}")
        if ip_bbox is not None and len(ip_bbox) > manga.max_num_ips:
            raise ValueError(
                f"{len(ip_bbox)} character bboxes > max_num_ips="
                f"{manga.max_num_ips}")
        if (ip_pixel_values is not None and ip_bbox is not None
                and 0 < n_chars < manga.max_num_ips
                and len(ip_bbox) < n_chars):
            # callers may pass images pre-padded to max_num_ips (the serving
            # layer does); count mismatch is only checkable on unpadded input
            raise ValueError(
                f"{n_chars} character images but only {len(ip_bbox)} bboxes")
        if dialog_bbox is not None and len(dialog_bbox) > manga.max_num_dialogs:
            raise ValueError(
                f"{len(dialog_bbox)} dialog bboxes > max_num_dialogs="
                f"{manga.max_num_dialogs}")

    # -- character embedding prep (reference :104-154) ------------------------
    def prepare_ip_image_embeds(
        self,
        ip_pixel_values: Optional[jnp.ndarray],
        ip_image_embeds: Optional[jnp.ndarray] = None,
        num_valid: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Character crops → (positive, negative) resampled IP tokens.

        Args:
          ip_pixel_values: [max_num_ips, H, W, 3] preprocessed crops, black-image
            padded to ``max_num_ips`` (reference pads at ``:118-122``), or None
            when ``ip_image_embeds`` carries precomputed MLLM features.
          ip_image_embeds: [num_valid, V, D_cross] precomputed per-character token
            blocks to paste over the resampler output (reference ``:143-145``).
          num_valid: count of real (non-padding) characters.

        Returns (pos, neg): each [1, D + I*V, D_cross].
        """
        m = self.m
        manga = m.manga
        if ip_pixel_values is not None:
            n_ips = ip_pixel_values.shape[0]
            if n_ips < manga.max_num_ips:
                # pad to max_num_ips inside the pipeline like the reference
                # (black crops, pipeline_diffsensei.py:118-122); the padded
                # characters' embeddings are zeroed below via num_valid, so
                # the pad content never reaches the resampler.
                ip_pixel_values = jnp.concatenate([
                    jnp.asarray(ip_pixel_values),
                    jnp.zeros((manga.max_num_ips - n_ips,)
                              + tuple(ip_pixel_values.shape[1:]),
                              jnp.asarray(ip_pixel_values).dtype)], axis=0)
                num_valid = (n_ips if num_valid is None
                             else min(num_valid, n_ips))
                n_ips = manga.max_num_ips
            clip_h, _ = m.image_encoder.apply(m.image_encoder_params,
                                              ip_pixel_values)
            _, magi_cls = m.magi_encoder.apply(m.magi_encoder_params,
                                               ip_pixel_values)
            clip_h = clip_h[None]                       # [1, I, P, D]
            magi_cls = magi_cls[None]                   # [1, I, Dm]
            if num_valid is not None and num_valid < n_ips:
                # zero the padding characters' embeddings (reference :131-132)
                valid = (jnp.arange(n_ips) < num_valid)
                clip_h = clip_h * valid[None, :, None, None]
                magi_cls = magi_cls * valid[None, :, None]
        else:
            n_ips = manga.max_num_ips
            p = m.resampler.config
            clip_h = jnp.zeros((1, n_ips, m.image_encoder.config.seq_len,
                                p.embedding_dim), jnp.float32)
            magi_cls = jnp.zeros((1, n_ips, p.magi_embedding_dim), jnp.float32)

        pos = m.resampler.apply(m.resampler_params, clip_h, magi_cls)
        neg = m.resampler.apply(m.resampler_params,
                                jnp.zeros_like(clip_h), jnp.zeros_like(magi_cls))

        if ip_image_embeds is not None:
            # paste MLLM-adapted per-character blocks over the resampler output
            nv = ip_image_embeds.shape[0]
            v = manga.num_vision_tokens
            pasted = jax.lax.dynamic_update_slice(
                pos, ip_image_embeds.reshape(1, nv * v, -1).astype(pos.dtype),
                (0, manga.num_dummy_tokens, 0))
            pos = pasted
        return pos, neg

    def _prepare_bboxes(self, ip_bbox, dialog_bbox, num_samples: int):
        """CFG bbox batch ``[uncond ‖ cond]``: the uncond half gets ALL-ZERO
        boxes (reference ``prepare_ip_image_embeds`` :138 and
        ``prepare_dialog_bbox`` :168), so the negative branch attends only the
        dummy block and receives no dialog embedding."""
        manga = self.m.manga
        def cfg_pad(boxes, max_n):
            arr = np.zeros((max_n, 4), np.float32)
            if boxes is not None:
                boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
                arr[:min(len(boxes), max_n)] = boxes[:max_n]
            out = np.zeros((2 * num_samples, max_n, 4), np.float32)
            out[num_samples:] = arr[None]
            return jnp.asarray(out)
        return (cfg_pad(ip_bbox, manga.max_num_ips),
                cfg_pad(dialog_bbox, manga.max_num_dialogs))

    # -- main entry (reference __call__ :181-372) ------------------------------
    def __call__(
        self,
        prompt: str = "",
        *,
        prompt_2: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
        negative_prompt_2: Optional[str] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        num_samples: int = 1,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        ip_pixel_values: Optional[jnp.ndarray] = None,
        ip_image_embeds: Optional[jnp.ndarray] = None,
        ip_bbox: Optional[Sequence[Sequence[float]]] = None,
        ip_scale: Optional[float] = None,
        dialog_bbox: Optional[Sequence[Sequence[float]]] = None,
        snap_to_buckets: bool = True,
        prompt_ids: Optional[Dict[str, jnp.ndarray]] = None,
        return_latents: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_split: int = 2,
    ) -> jnp.ndarray:
        """Generate panels; returns [num_samples, H, W, 3] in [0, 1] (fp32).

        ``ip_pixel_values`` and ``ip_image_embeds`` follow the reference's mutual
        contract (``check_inputs``, ``:81-102``): embeds, when given, are pasted
        over the encoded characters.

        ``deep_cache_interval=N`` (opt-in) recomputes the UNet's deep subtree
        (levels >= ``deep_cache_split`` + mid) only every N-th denoise step,
        reusing the cached feature in between (DeepCache-family speed/quality
        knob; N=1 is exact, N=2-3 typical). Masked-IP cross-attention at the
        shallow levels stays live every step.

        ``latents``: caller-supplied standard-normal draw
        [num_samples, H/8, W/8, C] replacing the internal ``rng`` draw (the
        diffusers ``latents=`` surface the reference inherits through
        ``prepare_latents``, pipeline_diffsensei.py:253) — lets the serving
        layer split one request across calls while keeping per-seed outputs
        identical (``serve/api.py`` auto-batch policy)."""
        cfg = self.config
        m = self.m
        manga = m.manga
        steps = num_inference_steps or cfg.num_inference_steps
        gscale = cfg.guidance_scale if guidance_scale is None else guidance_scale
        ipscale = cfg.ip_scale if ip_scale is None else ip_scale
        neg = cfg.negative_prompt if negative_prompt is None else negative_prompt
        rng = rng if rng is not None else jax.random.key(0)

        self.check_inputs(prompt, ip_pixel_values, ip_image_embeds, ip_bbox,
                          dialog_bbox, num_samples)
        if snap_to_buckets:
            height, width = snap_to_bucket(height, width)
        lh, lw = height // self.latent_scale, width // self.latent_scale

        # 1. text (row 0 = negative, row 1 = positive)
        ctx, pooled = self.encode_prompt(prompt, neg, prompt_2=prompt_2,
                                         negative_prompt_2=negative_prompt_2,
                                         **(prompt_ids or {}))

        # 2. characters
        use_ip = (ip_pixel_values is not None or ip_image_embeds is not None) \
            and m.resampler is not None
        if use_ip:
            num_valid = None
            if ip_bbox is not None:
                num_valid = len(ip_bbox)
            ip_pos, ip_neg = self.prepare_ip_image_embeds(
                ip_pixel_values, ip_image_embeds, num_valid)
            ip_tokens = jnp.concatenate(
                [jnp.repeat(ip_neg, num_samples, 0),
                 jnp.repeat(ip_pos, num_samples, 0)], axis=0)
        else:
            ip_tokens = None

        # 3. bboxes + per-level attention biases (hoisted out of the loop)
        ip_bbox_arr, dialog_arr = self._prepare_bboxes(
            ip_bbox, dialog_bbox, num_samples)
        ip_biases = {}
        if use_ip:
            for level in attention_levels(m.unet.config):
                ip_biases[level] = build_ip_attention_bias(
                    ip_bbox_arr, *level_spatial_shape(m.unet.config, lh, lw,
                                                      level),
                    manga.num_vision_tokens, manga.num_dummy_tokens)

        # 4. SDXL micro-conditioning: caller-supplied (orig, crop, target)
        # sizes, defaulting to the panel size (reference passes them through
        # to _get_add_time_ids, pipeline_diffsensei.py:181-203,279)
        orig = original_size or (height, width)
        tgt = target_size or (height, width)
        time_ids = jnp.asarray(
            [[orig[0], orig[1], crops_coords_top_left[0],
              crops_coords_top_left[1], tgt[0], tgt[1]]], jnp.float32)
        time_ids = jnp.repeat(time_ids, 2 * num_samples, axis=0)

        # 5. latents
        lat_shape = (num_samples, lh, lw, m.unet.config.in_channels)
        if latents is None:
            latents = jax.random.normal(rng, lat_shape, jnp.float32)
        elif tuple(latents.shape) != lat_shape:
            raise ValueError(f"latents must be {lat_shape}, "
                             f"got {tuple(latents.shape)}")
        sampler = make_sampler(cfg.scheduler, steps)
        latents = latents * sampler.init_noise_sigma

        ctx = jnp.repeat(ctx, num_samples, axis=0)
        pooled = jnp.repeat(pooled, num_samples, axis=0)

        if self.mesh is not None and not self.config.context_parallel:
            # batched multi-chip serving: CFG batch over the data axis
            data = self.mesh.shape["data"]
            if (2 * num_samples) % data == 0:
                ctx, pooled, time_ids, ip_tokens, ip_biases, dialog_arr = \
                    self._shard((ctx, pooled, time_ids, ip_tokens, ip_biases,
                                 dialog_arr))
                if num_samples % data == 0:
                    latents = self._shard(latents)

        latents = _denoise(
            m.unet, m.unet_params, sampler, latents, ctx, pooled, time_ids,
            ip_tokens, ip_biases if use_ip else None,
            dialog_arr, jnp.asarray(gscale, jnp.float32),
            jnp.asarray(ipscale, jnp.float32), use_ip=use_ip,
            cache_interval=deep_cache_interval, cache_split=deep_cache_split)

        if return_latents:
            return latents
        return _decode_any(m.vae, m.vae_params, latents,
                           jnp.asarray(self.vae_scaling, jnp.float32))
