"""End-to-end tiny-config pipeline tests (CPU, few steps, small latents).

Covers BASELINE.json config #1 (unconditioned t2i at small size, DDIM) and the
wo-MLLM conditioned path (config #2 shape-wise): characters + bboxes + dialog.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline, PipelineModules


@pytest.fixture(scope="module")
def tiny_pipeline():
    modules = PipelineModules.tiny(jax.random.key(0))
    return DiffSenseiPipeline(modules)


def _prompt_ids(vocab=256):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.integers(1, vocab - 1, (1, 77)), jnp.int32)
    return dict(ids=mk(), neg_ids=mk(), ids_2=mk(), neg_ids_2=mk())


def test_unconditioned_t2i(tiny_pipeline):
    images = tiny_pipeline(
        height=64, width=64, num_inference_steps=4, guidance_scale=5.0,
        num_samples=1, rng=jax.random.key(1), prompt_ids=_prompt_ids(),
        snap_to_buckets=False,
    )
    assert images.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(images).all())
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0


def test_conditioned_wo_mllm(tiny_pipeline):
    manga = tiny_pipeline.m.manga
    chars = jnp.ones((manga.max_num_ips, 224, 224, 3), jnp.float32) * 0.2
    images = tiny_pipeline(
        height=64, width=64, num_inference_steps=2,
        num_samples=2, rng=jax.random.key(2), prompt_ids=_prompt_ids(),
        ip_pixel_values=chars,
        ip_bbox=[[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 1.0, 1.0]],
        dialog_bbox=[[0.1, 0.0, 0.4, 0.2]],
        snap_to_buckets=False,
    )
    assert images.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(images).all())


def test_fewer_chars_than_max_pads_like_reference(tiny_pipeline):
    """One character with max_num_ips=2 must work — the pipeline pads to
    max_num_ips internally (reference pipeline_diffsensei.py:118-122) and the
    result is bit-identical to a caller-pre-padded call with the same
    num_valid (the pad rows' embeddings are zeroed either way)."""
    manga = tiny_pipeline.m.manga
    assert manga.max_num_ips >= 2
    one = jnp.ones((1, 224, 224, 3), jnp.float32) * 0.2
    kw = dict(height=64, width=64, num_inference_steps=2,
              rng=jax.random.key(6), prompt_ids=_prompt_ids(),
              ip_bbox=[[0.0, 0.0, 0.5, 1.0]], snap_to_buckets=False)
    unpadded = tiny_pipeline(ip_pixel_values=one, **kw)
    assert unpadded.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(unpadded).all())
    padded = jnp.concatenate(
        [one, jnp.zeros((manga.max_num_ips - 1, 224, 224, 3))], axis=0)
    pre_padded = tiny_pipeline(ip_pixel_values=padded, **kw)
    assert bool((unpadded == pre_padded).all())


def test_ip_image_embeds_paste(tiny_pipeline):
    """The MLLM paste-over path (reference pipeline_diffsensei.py:143-145)."""
    manga = tiny_pipeline.m.manga
    cross = tiny_pipeline.m.unet.config.cross_attention_dim
    embeds = jnp.ones((1, manga.num_vision_tokens, cross), jnp.float32) * 0.1
    latents = tiny_pipeline(
        height=64, width=64, num_inference_steps=2,
        rng=jax.random.key(3), prompt_ids=_prompt_ids(),
        ip_image_embeds=embeds,
        ip_bbox=[[0.0, 0.0, 1.0, 1.0]],
        snap_to_buckets=False, return_latents=True,
    )
    assert latents.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(latents).all())


def test_dpmsolver_pipeline_end_to_end(tiny_pipeline):
    """DPM-Solver++ (2M) through the full jitted pipeline: finite panel,
    deterministic, and actually a different trajectory than Euler."""
    import dataclasses

    from diffsensei_tpu.core.config import PipelineConfig

    dpm = DiffSenseiPipeline(
        tiny_pipeline.m,
        dataclasses.replace(PipelineConfig(), scheduler="dpmsolver++"))
    kwargs = dict(height=64, width=64, num_inference_steps=4,
                  guidance_scale=5.0, num_samples=1, rng=jax.random.key(7),
                  prompt_ids=_prompt_ids(), snap_to_buckets=False)
    images = dpm(**kwargs)
    assert images.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(images).all())
    np.testing.assert_array_equal(np.asarray(images), np.asarray(dpm(**kwargs)))
    euler = np.asarray(tiny_pipeline(**kwargs))
    assert np.abs(euler - np.asarray(images)).max() > 1e-4


def test_determinism_same_seed_bit_identical(tiny_pipeline):
    """Seeded generation is bit-identical (the reference's determinism story
    is torch.Generator seeding; functional JAX RNG makes it exact)."""
    kwargs = dict(height=64, width=64, num_inference_steps=2,
                  rng=jax.random.key(11), prompt_ids=_prompt_ids(),
                  snap_to_buckets=False, return_latents=True)
    a = tiny_pipeline(**kwargs)
    b = tiny_pipeline(**kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snap_to_buckets(tiny_pipeline):
    """Free-form sizes land on the bucket grid (serving recompile control)."""
    latents = tiny_pipeline(
        height=250, width=1000, num_inference_steps=1,
        rng=jax.random.key(4), prompt_ids=_prompt_ids(),
        return_latents=True,
    )
    # 250x1000 (area 250k) snaps to the 512-class bucket (256, 1024)
    # -> latents (32, 128)
    assert latents.shape == (1, 32, 128, 4)


def test_micro_conditioning_and_cfg_bboxes(tiny_pipeline, monkeypatch):
    """Caller-supplied SDXL micro-conditioning reaches time_ids, and the CFG
    bbox batch has ZERO boxes on the uncond half (reference
    prepare_ip_image_embeds :138 / prepare_dialog_bbox :168; ADVICE r1)."""
    from diffsensei_tpu.pipelines import pipeline as pl

    captured = {}

    def fake_denoise(unet, unet_params, sampler, latents, ctx, pooled,
                     time_ids, ip_tokens, ip_biases, dialog_bbox,
                     guidance_scale, ip_scale, *, use_ip, **_cache_kwargs):
        captured["time_ids"] = np.asarray(time_ids)
        captured["dialog"] = np.asarray(dialog_bbox)
        return latents

    monkeypatch.setattr(pl, "_denoise", fake_denoise)
    tiny_pipeline(
        height=64, width=64, num_inference_steps=2, num_samples=2,
        rng=jax.random.key(0), prompt_ids=_prompt_ids(),
        original_size=(512, 384), crops_coords_top_left=(16, 24),
        target_size=(128, 96),
        dialog_bbox=[[0.1, 0.2, 0.5, 0.6]],
        return_latents=True, snap_to_buckets=False)
    np.testing.assert_array_equal(
        captured["time_ids"],
        np.tile([[512, 384, 16, 24, 128, 96]], (4, 1)).astype(np.float32))
    dlg = captured["dialog"]
    assert dlg.shape[0] == 4
    np.testing.assert_array_equal(dlg[:2], np.zeros_like(dlg[:2]))  # uncond
    np.testing.assert_allclose(dlg[2, 0], [0.1, 0.2, 0.5, 0.6],
                               rtol=1e-6)                           # cond


def test_prompt_2_changes_output(tiny_pipeline):
    """Dual-prompt surface: ids_2 differing from ids changes the panel."""
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(rng.integers(1, 255, (1, 77)), jnp.int32)
    base = dict(ids=mk(), neg_ids=mk(), ids_2=mk(), neg_ids_2=mk())
    alt = dict(base, ids_2=mk())
    a = tiny_pipeline(height=64, width=64, num_inference_steps=2,
                      rng=jax.random.key(5), prompt_ids=base,
                      snap_to_buckets=False)
    b = tiny_pipeline(height=64, width=64, num_inference_steps=2,
                      rng=jax.random.key(5), prompt_ids=alt,
                      snap_to_buckets=False)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
