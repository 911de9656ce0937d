"""Headless serving API: the demos' generation logic without the UI.

The reference's serving layer is two Gradio scripts whose core is
``result_generation`` (``scripts/demo/gradio.py:60-135`` with the MLLM,
``scripts/demo/gradio_wo_mllm.py:27-66`` without). This module is that core as
a library: load character images, optionally run the SEED-X agent to adapt the
character embeddings to the prompt, blend by ``mllm_scale``, call the pipeline.

Defects of the reference's serving path fixed here (SURVEY.md "known defects"):
the bare ``except``-as-OOM handler that returns an unbound variable
(``gradio.py:130-135``), and the crash when no bbox is drawn
(``gradio.py:140-157``) — empty bbox lists are valid input.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffsensei_tpu.data import processors
from diffsensei_tpu.data.mllm_dataset import (
    MLLMTokenSpec, build_inference_prompt)
from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline


@dataclasses.dataclass
class GenerationRequest:
    prompt: str = ""
    height: int = 1024
    width: int = 1024
    num_inference_steps: Optional[int] = None
    guidance_scale: Optional[float] = None
    negative_prompt: Optional[str] = None
    num_samples: int = 1
    seed: int = 0
    character_images: Sequence[Image.Image] = ()
    ip_bbox: Sequence[Sequence[float]] = ()
    dialog_bbox: Sequence[Sequence[float]] = ()
    ip_scale: Optional[float] = None
    mllm_scale: Optional[float] = None   # only used when an agent is attached
    prompt_ids: Optional[dict] = None    # test hook: pre-tokenized prompts
    # DeepCache-style serving knob: recompute the UNet's deep subtree every
    # N-th denoise step (None/1 = exact; 2-3 = faster, approximate)
    deep_cache_interval: Optional[int] = None
    deep_cache_split: int = 2


class DiffSenseiServer:
    """Pipeline (+ optional MLLM agent) behind a single ``generate`` call.

    Multi-sample requests follow the measured-best batching policy for the
    bucket (docs/PERF.md "Batching panels", v5e round-3 device-anchored):
    at ≤``auto_batch_max_side``px (default 512 — bs4 = 2.05 panels/s, +13%
    over sequential) the samples run as ONE batched denoise; above it
    (1024² saturates the chip at the CFG batch of 2 — bs4 measured 0.39 vs
    bs1 0.42 panels/s) they run sequentially at batch 1. Both modes draw the
    request's latents once from ``seed`` and produce the same panels
    (pipeline ``latents=`` passthrough). ``auto_batch_max_side=None``
    disables the policy (always one batched call — pre-round-5 behavior).
    """

    def __init__(self, pipeline: DiffSenseiPipeline, agent=None,
                 mllm_spec: Optional[MLLMTokenSpec] = None,
                 mllm_max_new_tokens: int = 500,
                 auto_batch_max_side: Optional[int] = 512):
        self.pipeline = pipeline
        self.agent = agent
        self.mllm_spec = mllm_spec
        self.mllm_max_new_tokens = mllm_max_new_tokens
        self.auto_batch_max_side = auto_batch_max_side

    def _preprocess_characters(self, images: Sequence[Image.Image]):
        """Pad with black to max_num_ips; grayscale→RGB like the demo
        (``gradio.py:174-175``). Returns (clip_pixels, num_valid)."""
        manga = self.pipeline.m.manga
        imgs = [im.convert("RGB") for im in images][: manga.max_num_ips]
        n_valid = len(imgs)
        while len(imgs) < manga.max_num_ips:
            imgs.append(Image.new("RGB", (224, 224), (0, 0, 0)))
        return jnp.asarray(processors.batch_clip(imgs)), n_valid

    def _adapt_with_mllm(self, req: GenerationRequest,
                         clip_pixels: jnp.ndarray, n_valid: int):
        """SEED-X character-feature adaptation (``gradio.py:60-109``):
        encode chars → resampler → agent.generate → blend by mllm_scale."""
        pipe = self.pipeline
        m = pipe.m
        manga = m.manga
        pos, _ = pipe.prepare_ip_image_embeds(clip_pixels, None, n_valid)
        char_block = pos[:, manga.num_dummy_tokens:, :]      # [1, I*V, D]

        caption_ids = self.mllm_spec.encode_text(req.prompt)
        newline = self.mllm_spec.encode_text("\n")
        prompt = build_inference_prompt(caption_ids, self.mllm_spec, newline)
        out = self.agent.generate(
            prompt["input_ids"],
            image_embeds=char_block,
            ids_cmp_mask=jnp.asarray(prompt["ids_cmp_mask"]),
            ladder_ids=self.mllm_spec.ladder_ids,
            max_new_tokens=self.mllm_max_new_tokens)
        if out["img_gen_feat"] is None:
            return None
        gen = out["img_gen_feat"][:1]                        # [1, I*V, D]
        scale = (pipe.config.mllm_scale if req.mllm_scale is None
                 else req.mllm_scale)
        blended = scale * gen + (1.0 - scale) * char_block   # gradio.py:108-109
        v = manga.num_vision_tokens
        return blended.reshape(-1, v, blended.shape[-1])     # per-char blocks

    def generate(self, req: GenerationRequest) -> np.ndarray:
        """Returns [num_samples, H, W, 3] float32 in [0, 1]."""
        clip_pixels = None
        ip_image_embeds = None
        n_valid = 0
        if req.character_images:
            clip_pixels, n_valid = self._preprocess_characters(
                req.character_images)
            if self.agent is not None and self.mllm_spec is not None:
                ip_image_embeds = self._adapt_with_mllm(req, clip_pixels,
                                                        n_valid)

        manga = self.pipeline.m.manga
        ip_bbox = list(req.ip_bbox)[: manga.max_num_ips] or None
        dialog_bbox = list(req.dialog_bbox)[: manga.max_num_dialogs] or None
        kwargs = dict(
            num_inference_steps=req.num_inference_steps,
            guidance_scale=req.guidance_scale,
            negative_prompt=req.negative_prompt,
            ip_pixel_values=clip_pixels,
            ip_image_embeds=ip_image_embeds,
            ip_bbox=ip_bbox,
            ip_scale=req.ip_scale,
            dialog_bbox=dialog_bbox,
            prompt_ids=req.prompt_ids,
            deep_cache_interval=req.deep_cache_interval,
            deep_cache_split=req.deep_cache_split,
        )
        # one standard-normal draw per request, shared by both batching
        # modes so the policy never changes the panels a seed produces
        from diffsensei_tpu.core.buckets import snap_to_bucket
        height, width = snap_to_bucket(req.height, req.width)
        pipe = self.pipeline
        lh = height // pipe.latent_scale
        lw = width // pipe.latent_scale
        lat = jax.random.normal(
            jax.random.key(req.seed),
            (req.num_samples, lh, lw, pipe.m.unet.config.in_channels),
            jnp.float32)
        batched = (req.num_samples == 1
                   or self.auto_batch_max_side is None
                   or max(height, width) <= self.auto_batch_max_side)
        if batched:
            images = pipe(req.prompt, height=height, width=width,
                          num_samples=req.num_samples, latents=lat, **kwargs)
            return np.asarray(images)
        return np.concatenate(
            [np.asarray(pipe(req.prompt, height=height, width=width,
                             num_samples=1, latents=lat[i:i + 1], **kwargs))
             for i in range(req.num_samples)], axis=0)

    def generate_pil(self, req: GenerationRequest) -> List[Image.Image]:
        arr = (self.generate(req) * 255).round().astype(np.uint8)
        return [Image.fromarray(a) for a in arr]

    def warmup(self, sizes: Sequence[Tuple[int, int]],
               num_inference_steps: Optional[int] = None,
               conditioned: bool = True, num_samples: int = 1,
               deep_cache_interval: Optional[int] = None,
               deep_cache_split: int = 2) -> None:
        """Precompile the serving programs for the given (H, W) sizes.

        One denoise program exists per (bucket, batch, steps) key; a cold
        bucket costs minutes of XLA compile on first request (then lands in
        the persistent cache, ``core/cache.py``). Run this at server start
        for the sizes production will serve. ``conditioned=True`` warms the
        masked-IP + dialog variant of the program (the unconditioned graph
        is a different program). Pass the ``deep_cache_*`` knobs production
        will use — the cached-loop program is distinct too.
        """
        manga = self.pipeline.m.manga
        zero_ids = {k: jnp.zeros((1, 77), jnp.int32)
                    for k in ("ids", "neg_ids", "ids_2", "neg_ids_2")}
        prompt_ids = None if self.pipeline.m.tokenizer is not None \
            else zero_ids
        for h, w in sizes:
            kwargs = dict(height=h, width=w,
                          num_inference_steps=num_inference_steps,
                          num_samples=num_samples, rng=jax.random.key(0),
                          prompt_ids=prompt_ids,
                          deep_cache_interval=deep_cache_interval,
                          deep_cache_split=deep_cache_split)
            if conditioned:
                kwargs.update(
                    ip_pixel_values=jnp.zeros(
                        (manga.max_num_ips, 224, 224, 3), jnp.float32),
                    ip_bbox=[[0.0, 0.0, 0.5, 0.5]],
                    dialog_bbox=[[0.1, 0.1, 0.4, 0.3]])
            self.pipeline("", **kwargs)
