"""Multi-layer transformer stacks: forward, training-grad, port layout.

(The stacks are Python-unrolled by design: nn.scan was measured SLOWER on v5e
for both compile and steady state — see Transformer2D docstring.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.core.config import MangaConfig, UNetConfig
from diffsensei_tpu.models.unet import Transformer2D, UNetMangaModel

from tests.test_models import _unet_inputs


def _deep_cfg():
    manga = MangaConfig(max_num_ips=2, num_vision_tokens=4,
                        num_dummy_tokens=4, max_num_dialogs=3)
    return dataclasses.replace(UNetConfig.tiny(manga),
                               transformer_layers_per_block=(0, 3),
                               mid_transformer_layers=2)


def test_multilayer_transformer_params():
    model = Transformer2D(num_layers=3, heads=2, norm_num_groups=8)
    x = jnp.ones((1, 4, 4, 32))
    ctx = jnp.ones((1, 7, 32))
    params = model.init(jax.random.key(0), x, ctx, None, None, 1.0)
    for i in range(3):
        assert f"blocks_{i}" in params["params"]
    out = model.apply(params, x, ctx, None, None, 1.0)
    assert out.shape == x.shape


def test_deep_unet_forward_and_grad():
    cfg = _deep_cfg()
    model = UNetMangaModel(cfg)
    inputs = _unet_inputs(cfg, b=1, h=8, w=8)
    params = model.init(jax.random.key(0), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == (1, 8, 8, cfg.out_channels)

    def loss(p):
        return jnp.sum(jnp.square(model.apply(p, **inputs)))

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    g = grads["params"]["down_1_attn_0"]["blocks_2"]["attn1"]["to_q"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0


def test_port_multilayer_layout():
    from diffsensei_tpu.utils.port_torch import _port_transformer
    rng = np.random.default_rng(0)
    sd = {}
    c = 32

    def add_lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(dout, din)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((dout,), np.float32)

    def add_norm(name):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    add_norm("t.norm")
    add_lin("t.proj_in", c, c)
    add_lin("t.proj_out", c, c)
    for k in range(2):
        tb = f"t.transformer_blocks.{k}."
        for nm in ("norm1", "norm2", "norm3"):
            add_norm(tb + nm)
        for attn in ("attn1", "attn2"):
            add_lin(tb + f"{attn}.to_q", c, c, bias=False)
            add_lin(tb + f"{attn}.to_k", c, c, bias=False)
            add_lin(tb + f"{attn}.to_v", c, c, bias=False)
            add_lin(tb + f"{attn}.to_out.0", c, c)
        add_lin(tb + "ff.net.0.proj", c, c * 8)
        add_lin(tb + "ff.net.2", c * 4, c)

    out = _port_transformer(sd, "t.", 2)
    assert out["blocks_0"]["attn1"]["to_q"]["kernel"].shape == (c, c)
    assert out["blocks_1"]["attn1"]["to_q"]["kernel"].shape == (c, c)
    assert not np.allclose(out["blocks_0"]["attn1"]["to_q"]["kernel"],
                           out["blocks_1"]["attn1"]["to_q"]["kernel"])


def test_remat_policy_grads_match_full_remat():
    """remat_policy ('dots_deepest'/'dots') changes WHAT the backward saves,
    never the math: gradients must match the full-recompute baseline (the
    policies trade activation memory for replay time, docs/PERF.md)."""
    cfg = _deep_cfg()
    inputs = _unet_inputs(cfg, b=1, h=8, w=8)
    base = UNetMangaModel(cfg, remat_blocks=True)
    params = base.init(jax.random.key(0), **inputs)

    def grads_of(model):
        def loss(p):
            return jnp.sum(jnp.square(model.apply(p, **inputs)))
        return jax.grad(loss)(params)

    ref = grads_of(base)
    for policy in ("dots_deepest", "dots", "attn", "dots_attn"):
        got = grads_of(UNetMangaModel(cfg, remat_blocks=True,
                                      remat_policy=policy))
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
