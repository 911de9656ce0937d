"""UNet LoRA: the reference's ``unet_trained_parameters='lora'`` mode
(``scripts/train/train.py:162-174``) — adapter math, trainable selection,
merge-for-serving, and porter round-trips ignoring adapters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import UNetConfig
from diffsensei_tpu.models.lora import (
    LoRADense, ensure_lora_init, merge_lora_params)
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.models.unet import UNetMangaModel
from diffsensei_tpu.pipelines.pipeline import PipelineModules
from diffsensei_tpu.train.diffusion import (
    FrozenDiffusionStack, Stage2Config, TrainState, make_stage2_step)
from diffsensei_tpu.train.optim import (
    make_optimizer, partition_params, unet_trainable_mask)
from diffsensei_tpu.utils import export_torch, port_torch

RANK = 2


# ---------------------------------------------------------------------------
# LoRADense module
# ---------------------------------------------------------------------------
def test_lora_dense_is_identity_at_init_and_dense_compatible():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)), jnp.float32)
    base = LoRADense(4, lora_rank=0, use_bias=True)
    lora = LoRADense(4, lora_rank=RANK, use_bias=True)
    p = lora.init(jax.random.key(1), x)
    # adapter starts as a no-op (B = 0, reference gaussian init semantics)
    y_lora = lora.apply(p, x)
    # same tree minus the adapter leaves loads into the plain module:
    # kernel/bias paths are Dense-identical by construction
    p_base = {"params": {k: v for k, v in p["params"].items()
                         if not k.startswith("lora_")}}
    y_base = base.apply(p_base, x)
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_base),
                               rtol=1e-6)
    assert p["params"]["lora_a"].shape == (8, RANK)
    assert p["params"]["lora_b"].shape == (RANK, 4)
    assert np.any(np.asarray(p["params"]["lora_a"]))   # gaussian, not dead
    assert not np.any(np.asarray(p["params"]["lora_b"]))


def test_lora_dense_adapters_learn():
    """Two SGD steps on the adapter-only subtree reduce a regression loss
    (B gets gradient immediately; A after B moves off zero)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    mod = LoRADense(4, lora_rank=RANK, use_bias=False)
    params = mod.init(jax.random.key(3), x)

    def loss_fn(adapters, base):
        p = {"params": {**base, **adapters}}
        return jnp.mean((mod.apply(p, x) - target) ** 2)

    base = {"kernel": params["params"]["kernel"]}
    adapters = {k: v for k, v in params["params"].items()
                if k.startswith("lora_")}
    losses = [float(loss_fn(adapters, base))]
    for _ in range(3):
        g = jax.grad(loss_fn)(adapters, base)
        adapters = jax.tree.map(lambda p_, g_: p_ - 0.5 * g_, adapters, g)
        losses.append(float(loss_fn(adapters, base)))
    assert losses[-1] < losses[0]
    assert np.any(np.asarray(adapters["lora_a"])
                  != np.asarray(params["params"]["lora_a"]))


# ---------------------------------------------------------------------------
# UNet integration
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def lora_stack():
    modules = PipelineModules.tiny(jax.random.key(0), lora_rank=RANK)
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
    )
    return modules, frozen


def test_lora_mask_selects_adapters_plus_ip(lora_stack):
    modules, _ = lora_stack
    mask = unet_trainable_mask(modules.unet_params, "lora")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    picked = ["/".join(str(getattr(k, "key", k)) for k in path)
              for path, v in flat if v]
    assert picked, "lora mode selected nothing"
    for name in picked:
        assert ("lora_" in name) or ("_ip" in name), name
    # exactly the reference trainable set: adapters ∪ _ip (train.py:163-174)
    n_lora = sum("lora_" in n for n in picked)
    n_ip = sum("_ip" in n for n in picked)
    assert n_lora > 0 and n_ip > 0


def test_lora_mask_raises_on_zero_selection():
    # a tree with no adapters and no _ip params (e.g. a conv-only subtree)
    params = {"params": {"conv_in": {"kernel": jnp.zeros((3, 3, 4, 8))}}}
    with pytest.raises(ValueError, match="zero parameters"):
        unet_trainable_mask(params, "lora")


def test_cli_rejects_lora_mode_without_rank():
    from diffsensei_tpu.train.cli import build_models
    with pytest.raises(ValueError, match="lora_rank"):
        build_models({"preset": "tiny", "unet_trained_parameters": "lora"},
                     jax.random.key(0))


def test_stage2_lora_step_updates_only_lora_and_ip(lora_stack):
    """The partitioned-training path the CLI uses for mode='lora': the step
    updates adapters + IP projections and leaves every base weight
    bit-identical (mirrors test_stage2_step_trains_selected_params_only)."""
    from diffsensei_tpu.train.optim import merge_partitioned

    modules, frozen = lora_stack
    manga = modules.manga
    cfg = Stage2Config(manga=manga)
    umask = unet_trainable_mask(modules.unet_params, "lora")
    t_flat, f_flat = partition_params(modules.unet_params, umask)
    assert all(("lora_" in k) or ("_ip" in k) for k in t_flat)
    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               DDPMSchedule(), cfg)
    frozen = frozen.replace(unet_frozen_flat=f_flat)
    params = {"unet": t_flat, "resampler": modules.resampler_params}
    state = TrainState.create(params, make_optimizer(1e-3))

    from tests.test_train import _stage2_batch
    batch = _stage2_batch(manga)
    state2, metrics = jax.jit(step_fn)(state, frozen, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    moved = {k: bool(jnp.any(state.params["unet"][k]
                             != state2.params["unet"][k]))
             for k in state.params["unet"]}
    # lora_b starts at zero with nonzero gradient (A is gaussian) — it must
    # move; _ip projections sit in the denoised path and must move too
    assert any(v for k, v in moved.items() if "lora_b" in k)
    assert any(v for k, v in moved.items() if "_ip" in k)
    # the full merged tree applies cleanly after the update
    full = merge_partitioned(state2.params["unet"], f_flat)
    chex_leaves = jax.tree.leaves(full)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in chex_leaves)


# ---------------------------------------------------------------------------
# merge + porter round-trips
# ---------------------------------------------------------------------------
def _unet_inputs(cfg):
    manga = cfg.manga
    rng = np.random.default_rng(5)
    b, h, w = 1, 8, 8
    return (
        jnp.asarray(rng.normal(size=(b, h, w, cfg.in_channels)), jnp.float32),
        jnp.full((b,), 10.0, jnp.float32),
        jnp.asarray(rng.normal(size=(b, 77, cfg.cross_attention_dim)),
                    jnp.float32),
        jnp.asarray(rng.normal(size=(b, cfg.pooled_projection_dim)),
                    jnp.float32),
        jnp.full((b, 6), 64.0, jnp.float32),
    )


def test_merge_lora_matches_adapter_forward():
    cfg = UNetConfig.tiny()
    lora_cfg = dataclasses.replace(cfg, lora_rank=RANK)
    unet_lora = UNetMangaModel(lora_cfg)
    unet_base = UNetMangaModel(cfg)
    args = _unet_inputs(cfg)
    params = unet_lora.init(jax.random.key(7), *args)
    # make the adapters non-trivial so the merge actually moves kernels
    rng = np.random.default_rng(8)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.asarray(rng.normal(0, 0.05, x.shape), x.dtype)
        if "lora_b" in "/".join(str(getattr(k, "key", k)) for k in p) else x,
        params)
    y_lora = unet_lora.apply(params, *args)
    merged = merge_lora_params(params)
    assert not any("lora" in "/".join(str(getattr(k, "key", k)) for k in path)
                   for path, _ in jax.tree_util.tree_leaves_with_path(merged))
    y_merged = unet_base.apply(merged, *args)
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_lora),
                               rtol=2e-4, atol=2e-5)


def test_export_drops_adapters_and_port_reinits_them():
    """Round trip: LoRA-trained tree → torch sd (no adapter keys) → ported
    tree + ensure_lora_init → applies under the lora model. (The VERDICT
    'porting/exporting round-trips ignore LoRA cleanly' requirement.)"""
    cfg = dataclasses.replace(UNetConfig.tiny(), lora_rank=RANK)
    unet = UNetMangaModel(cfg)
    args = _unet_inputs(cfg)
    params = unet.init(jax.random.key(9), *args)

    sd = export_torch.export_sdxl_unet_sd(params, cfg)
    assert not any("lora" in k for k in sd), "adapters leaked into the export"

    ported, missing = port_torch.port_sdxl_unet(sd, cfg)
    touched = ensure_lora_init(ported, RANK, seed=0)
    assert touched > 0
    y = unet.apply(ported, *args)
    assert np.all(np.isfinite(np.asarray(y)))
    # base weights identical through the round trip: merged output matches
    y_orig = UNetMangaModel(dataclasses.replace(cfg, lora_rank=0)).apply(
        merge_lora_params(params), *args)
    y_round = UNetMangaModel(dataclasses.replace(cfg, lora_rank=0)).apply(
        merge_lora_params(ported), *args)
    np.testing.assert_allclose(np.asarray(y_round), np.asarray(y_orig),
                               rtol=2e-4, atol=2e-5)
