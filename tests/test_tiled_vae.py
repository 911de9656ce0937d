"""Tiled VAE decode: shape correctness + closeness to the direct decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import VAEConfig
from diffsensei_tpu.models.vae import AutoencoderKL, tiled_decode


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                      jax.random.key(1))
    return cfg, vae, params


def test_tiling_machinery_is_exact_for_equivariant_decoder(tiny_vae):
    """With a spatially-equivariant decoder (pure upsampling), tiled output
    must EXACTLY equal the direct decode: proves tile offsets are right and
    blend weights sum to 1 everywhere. (Numeric closeness for the real VAE
    is only meaningful with trained weights — GroupNorm's global stats make
    per-tile decodes differ on a random-init net, the same approximation
    diffusers' enable_vae_tiling accepts.)"""
    cfg, vae, params = tiny_vae
    f = cfg.downscale_factor
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 24, 20, cfg.latent_channels)),
                    jnp.float32)

    def fake_decode(zt):
        up = jnp.repeat(jnp.repeat(zt, f, axis=1), f, axis=2)
        return up[..., : cfg.out_channels] * 2.0 + 0.1

    direct = fake_decode(z)
    tiled = tiled_decode(vae, params, z, tile=12, overlap=4,
                         decode_fn=fake_decode)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_tiled_small_input_is_exact(tiny_vae):
    cfg, vae, params = tiny_vae
    z = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 8, cfg.latent_channels)), jnp.float32)
    direct = vae.apply(params, z, method=vae.decode)
    tiled = tiled_decode(vae, params, z, tile=12, overlap=4)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_tiled_non_divisible_shape(tiny_vae):
    cfg, vae, params = tiny_vae
    z = jnp.ones((2, 20, 28, cfg.latent_channels), jnp.float32) * 0.1
    out = tiled_decode(vae, params, z, tile=12, overlap=4)
    f = cfg.downscale_factor
    assert out.shape == (2, 20 * f, 28 * f, cfg.out_channels)
    assert bool(jnp.isfinite(out).all())
