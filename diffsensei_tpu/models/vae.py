"""SDXL VAE (AutoencoderKL-equivalent) in JAX/Flax, NHWC.

The reference uses diffusers' ``AutoencoderKL`` — fp32 encode during training
(``scripts/train/train.py:339-341``) and an fp32-upcast decode at inference
(``src/pipelines/pipeline_diffsensei.py:339-365``, where fp16 overflows). On TPU the
VAE runs fp32 end-to-end (``core/dtypes.DTypePolicy.vae_dtype``): it is a tiny
fraction of pipeline FLOPs and fp32 removes the reference's overflow workaround.

Architecture matches SDXL's VAE: 4 encoder stages (128, 256, 512, 512) with 2
resnets each and a mid block with one self-attention; symmetric decoder with 3
resnets per stage; latent space 2*4 channels (mean ‖ logvar) with a 1x1 quant conv.
Mid-block attention runs over at most (H/8 * W/8) tokens — plain XLA attention.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import VAEConfig
from diffsensei_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D

Dtype = Any


class VAEAttention(nn.Module):
    """Single-head mid-block self-attention over spatial tokens."""

    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q, k, v = dense("to_q")(x), dense("to_k")(x), dense("to_v")(x)
        s = jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        x = jnp.einsum("bqk,bkc->bqc", p, v)
        x = dense("to_out")(x)
        return x.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in", **kw)(x)
        for level, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, cfg.norm_num_groups, use_time_emb=False,
                                  norm_eps=1e-6,
                                  name=f"down_{level}_resnet_{j}", **kw)(x)
            if level < len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, name=f"down_{level}_downsample", **kw)(x)
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, use_time_emb=False,
                          norm_eps=1e-6, name="mid_resnet_0", **kw)(x)
        x = VAEAttention(cfg.norm_num_groups, name="mid_attn", **kw)(x)
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, use_time_emb=False,
                          norm_eps=1e-6, name="mid_resnet_1", **kw)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       name="conv_out", **kw)(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mid_ch = cfg.block_out_channels[-1]
        x = nn.Conv(mid_ch, (3, 3), padding=1, name="conv_in", **kw)(z)
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, use_time_emb=False,
                          norm_eps=1e-6, name="mid_resnet_0", **kw)(x)
        x = VAEAttention(cfg.norm_num_groups, name="mid_attn", **kw)(x)
        x = ResnetBlock2D(mid_ch, cfg.norm_num_groups, use_time_emb=False,
                          norm_eps=1e-6, name="mid_resnet_1", **kw)(x)
        for rev, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, cfg.norm_num_groups, use_time_emb=False,
                                  norm_eps=1e-6,
                                  name=f"up_{rev}_resnet_{j}", **kw)(x)
            if rev < len(cfg.block_out_channels) - 1:
                x = Upsample2D(ch, name=f"up_{rev}_upsample", **kw)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       name="conv_out", **kw)(x)


class AutoencoderKL(nn.Module):
    """VAE with KL latent space; fp32 by default (see module docstring).

    ``encode`` returns (mean, logvar); sampling and the ``scaling_factor``
    multiply live in the caller (train step / pipeline), mirroring the reference's
    ``vae.encode(...).latent_dist.sample() * scaling_factor``
    (``scripts/train/train.py:339-341``).
    """

    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, name="encoder", **kw)
        self.decoder = Decoder(self.config, name="decoder", **kw)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv", **kw)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv", **kw)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
        return self.decode(z)


def sample_latent(mean: jnp.ndarray, logvar: jnp.ndarray, rng: jax.Array,
                  scaling_factor: float) -> jnp.ndarray:
    """Reparameterized latent sample scaled for the diffusion space."""
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return z * scaling_factor


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _cached_tiled_fn(vae: "AutoencoderKL", b: int, h: int, w: int, c: int,
                     tile: int, overlap: int):
    """One jitted tiled-decode program per (module, latent shape) key."""
    def fn(params, z):
        return tiled_decode(vae, params, z, tile=tile, overlap=overlap,
                            decode_fn=_DIRECT)
    return jax.jit(fn)


_DIRECT = object()   # sentinel: use vae.decode inside the cached jit


def tiled_decode(vae: AutoencoderKL, params, z: jnp.ndarray,
                 tile: int = 96, overlap: int = 24,
                 decode_fn=None) -> jnp.ndarray:
    """Decode in overlapping latent tiles with linear blending.

    The fp32 decoder at 2048² panels (256² latents) exceeds single-chip HBM
    (activations reach 2048·2048·512 fp32 per map); tiling bounds peak memory
    to one (tile+overlap)² decode. Seams are suppressed by decoding with
    ``overlap`` latent pixels of context and ramp-blending the overlapped
    pixel regions (the same approximation diffusers' ``enable_vae_tiling``
    makes — GroupNorm stats become per-tile).

    z: [B, H, W, C] latents (already divided by the scaling factor).
    ``decode_fn`` (test hook) overrides the per-tile decoder.

    Memory/scheduling shape (both variants were measured on v5e):
    * one jit with INDEPENDENT tile decodes → XLA interleaves them all →
      tile-count × peak memory → OOM;
    * a host loop with per-tile dispatch → ~3 s/tile of tunnel round-trips.
    So: one jit, with each tile's input carrying a fake scalar dependency on
    the previous tile's output — forces sequential scheduling (one decode
    resident) while accumulation stays on-device.
    """
    import numpy as np

    b, h, w, c = z.shape
    if h <= tile and w <= tile:
        if decode_fn is None or decode_fn is _DIRECT:
            return vae.apply(params, z, method=vae.decode)
        return decode_fn(z)
    f = vae.config.downscale_factor
    stride = tile - overlap

    plan = []
    for y0 in range(0, max(h - overlap, 1), stride):
        y0 = min(y0, h - tile) if h > tile else 0
        for x0 in range(0, max(w - overlap, 1), stride):
            x0 = min(x0, w - tile) if w > tile else 0
            plan.append((y0, x0))

    def ramp(length, start_px, total_px):
        r = np.ones((length,), np.float32)
        ov_px = overlap * f
        if start_px > 0:
            r[:ov_px] = np.linspace(0.0, 1.0, ov_px, endpoint=False)
        if start_px + length < total_px:
            r[-ov_px:] = r[-ov_px:] * np.linspace(1.0, 0.0, ov_px,
                                                  endpoint=False)
        return r

    th, tw = tile * f, tile * f
    weight = np.zeros((1, h * f, w * f, 1), np.float32)
    masks = {}
    for (y0, x0) in plan:
        wy = ramp(th, y0 * f, h * f)
        wx = ramp(tw, x0 * f, w * f)
        m = (wy[:, None] * wx[None, :])[None, :, :, None]
        masks[(y0, x0)] = m
        weight[:, y0 * f:y0 * f + th, x0 * f:x0 * f + tw] += m
    inv_weight = jnp.asarray(1.0 / np.clip(weight, 1e-6, None))

    def decode_all(params, z, inner):
        out = jnp.zeros((b, h * f, w * f, vae.config.out_channels),
                        jnp.float32)
        dep = jnp.float32(0.0)
        for (y0, x0) in plan:
            zt = z[:, y0:y0 + tile, x0:x0 + tile]
            # fake dependency on the previous tile's output: forces the
            # scheduler to run tiles sequentially (bounded peak memory)
            zt = zt + (dep * 0.0).astype(zt.dtype)
            img = inner(params, zt).astype(jnp.float32)
            dep = img[0, 0, 0, 0]
            out = out.at[:, y0 * f:y0 * f + th, x0 * f:x0 * f + tw].add(
                img * jnp.asarray(masks[(y0, x0)]))
        return out * inv_weight

    if decode_fn is _DIRECT:           # inside the cached jit
        return decode_all(params, z,
                          lambda p, zt: vae.apply(p, zt, method=vae.decode))
    if decode_fn is not None:          # test hook: run un-jitted
        return decode_all(params, z, lambda _, zt: decode_fn(zt))
    fn = _cached_tiled_fn(vae, b, h, w, c, tile, overlap)
    return fn(params, z)
