"""Shape/finiteness tests for the diffusion-stack models on tiny configs.

The reference has no tests (SURVEY.md §4); tiny-config forward checks are the
substitute for "run a real job". All run on CPU with fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import (
    MangaConfig,
    ResamplerConfig,
    TextEncoderConfig,
    UNetConfig,
    VAEConfig,
    VisionEncoderConfig,
)
from diffsensei_tpu.models.projection import ImageProjDummyModel, ImageProjModel
from diffsensei_tpu.models.resampler import Resampler
from diffsensei_tpu.models.text_encoder import CLIPTextEncoder
from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
from diffsensei_tpu.models.vae import AutoencoderKL
from diffsensei_tpu.models.vision_encoder import VisionTransformer
from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    model = UNetMangaModel(cfg)
    return cfg, model


def _unet_inputs(cfg: UNetConfig, b=2, h=16, w=16, with_ip=True, with_dialog=True):
    rng = np.random.default_rng(0)
    manga = cfg.manga
    inputs = dict(
        sample=jnp.asarray(rng.normal(size=(b, h, w, cfg.in_channels)), jnp.float32),
        timesteps=jnp.asarray([10.0] * b),
        encoder_hidden_states=jnp.asarray(
            rng.normal(size=(b, 77, cfg.cross_attention_dim)), jnp.float32),
        pooled_text_embeds=jnp.asarray(
            rng.normal(size=(b, cfg.pooled_projection_dim)), jnp.float32),
        time_ids=jnp.ones((b, 6), jnp.float32) * 64,
    )
    if with_ip:
        bbox = jnp.asarray(
            [[[0.0, 0.0, 0.5, 0.5], [0.4, 0.4, 1.0, 1.0]]] * b, jnp.float32)
        inputs["ip_hidden_states"] = jnp.asarray(rng.normal(size=(
            b, manga.num_context_image_tokens, cfg.cross_attention_dim)),
            jnp.float32)
        biases = {}
        for level in attention_levels(cfg):
            lh, lw = h >> level, w >> level
            biases[level] = build_ip_attention_bias(
                bbox, lh, lw, manga.num_vision_tokens, manga.num_dummy_tokens)
        inputs["ip_attn_bias"] = biases
        inputs["ip_scale"] = 0.7
    if with_dialog:
        inputs["dialog_bbox"] = jnp.asarray(
            [[[0.1, 0.1, 0.4, 0.3], [0.0, 0.0, 0.0, 0.0],
              [0.0, 0.0, 0.0, 0.0]]] * b, jnp.float32)
    return inputs


def test_unet_forward_shapes(tiny_unet):
    cfg, model = tiny_unet
    inputs = _unet_inputs(cfg)
    params = model.init(jax.random.key(0), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == (2, 16, 16, cfg.out_channels)
    assert bool(jnp.isfinite(out).all())


def test_unet_uncond_matches_zero_ip_scale(tiny_unet):
    """With ip_scale=0 the IP stream must be a no-op vs no IP at all."""
    cfg, model = tiny_unet
    with_ip = _unet_inputs(cfg, with_ip=True, with_dialog=False)
    params = model.init(jax.random.key(0), **with_ip)
    without = dict(with_ip)
    without.pop("ip_hidden_states"), without.pop("ip_attn_bias")
    without.pop("ip_scale")
    a = model.apply(params, **{**with_ip, "ip_scale": 0.0})
    b = model.apply(params, **without)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_dialog_embedding_zero_init_is_noop(tiny_unet):
    """dialog_bbox_embedding inits to zeros, so rasterizing must not change out."""
    cfg, model = tiny_unet
    inputs = _unet_inputs(cfg, with_ip=False)
    params = model.init(jax.random.key(0), **inputs)
    a = model.apply(params, **inputs)
    no_dialog = dict(inputs)
    no_dialog.pop("dialog_bbox")
    b = model.apply(params, **no_dialog)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    params = model.init(jax.random.key(0), x, jax.random.key(1))
    mean, logvar = model.apply(params, x, method=model.encode)
    f = cfg.downscale_factor
    assert mean.shape == (1, 32 // f, 32 // f, cfg.latent_channels)
    rec = model.apply(params, mean, method=model.decode)
    assert rec.shape == x.shape
    assert bool(jnp.isfinite(rec).all())


def test_text_encoder_shapes():
    cfg = TextEncoderConfig.tiny(projection_dim=24)
    model = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[5, 9, 200, 3, 0, 0, 0, 0]], jnp.int32)
    params = model.init(jax.random.key(0), ids)
    hidden, pooled = model.apply(params, ids)
    assert hidden.shape == (1, 8, cfg.hidden_size)
    assert pooled.shape == (1, 24)


def test_vision_encoder_shapes():
    cfg = VisionEncoderConfig.tiny()
    model = VisionTransformer(cfg)
    x = jnp.ones((2, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    penult, cls = model.apply(params, x)
    assert penult.shape == (2, cfg.seq_len, cfg.hidden_size)
    assert cls.shape == (2, cfg.hidden_size)


def test_resampler_output_layout():
    manga = MangaConfig(max_num_ips=2, num_vision_tokens=4, num_dummy_tokens=4)
    cfg = ResamplerConfig.tiny(manga)
    model = Resampler(cfg)
    clip = jnp.ones((3, manga.max_num_ips, 17, cfg.embedding_dim), jnp.float32)
    magi = jnp.ones((3, manga.max_num_ips, cfg.magi_embedding_dim), jnp.float32)
    params = model.init(jax.random.key(0), clip, magi)
    out = model.apply(params, clip, magi)
    assert out.shape == (3, manga.num_context_image_tokens, cfg.output_dim)
    # dummy block is input-independent: same across batch rows of different inputs
    clip2 = clip.at[1].set(2.0)
    out2 = model.apply(params, clip2, magi)
    np.testing.assert_allclose(
        np.asarray(out[:, :manga.num_dummy_tokens]),
        np.asarray(out2[:, :manga.num_dummy_tokens]), atol=1e-6)


def test_image_proj_models():
    proj = ImageProjModel(cross_attention_dim=16, num_tokens=4)
    x = jnp.ones((2, 24), jnp.float32)
    params = proj.init(jax.random.key(0), x)
    assert proj.apply(params, x).shape == (2, 4, 16)

    dummy = ImageProjDummyModel(cross_attention_dim=16, num_tokens=4,
                                num_dummy_tokens=3)
    clip = jnp.ones((2, 2, 24), jnp.float32)
    magi = jnp.ones((2, 2, 8), jnp.float32)
    params = dummy.init(jax.random.key(0), clip, magi)
    assert dummy.apply(params, clip, magi).shape == (2, 3 + 8, 16)
