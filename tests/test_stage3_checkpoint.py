"""Stage-3 (MLLM) train step and Orbax checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import AgentConfig
from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.pipelines.pipeline import PipelineModules
from diffsensei_tpu.train.checkpoint import (
    CheckpointManager, export_weights, latest_step_dir, load_weights)
from diffsensei_tpu.train.diffusion import FrozenDiffusionStack, TrainState
from diffsensei_tpu.train.mllm_step import Stage3Config, make_stage3_step
from diffsensei_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def stage3():
    modules = PipelineModules.tiny(jax.random.key(0))
    manga = modules.manga
    # agent whose image stream matches the resampler char-block geometry:
    # S_img = max_ips * num_vision_tokens = 8 tokens of width 32
    from diffsensei_tpu.core.config import LlamaConfig, QwenResamplerConfig
    # num_queries must equal max_ips*num_vision_tokens (=8 in the tiny manga)
    # so the agent's recon block can replace the UNet context char block —
    # exactly the production relation (64 = 4*16).
    iv = manga.num_ip_tokens
    llm = LlamaConfig.tiny()
    acfg = AgentConfig(
        llm=llm,
        input_resampler=QwenResamplerConfig(
            grid_size=2, num_queries_override=iv,
            embed_dim=llm.hidden_size, num_heads=4, kv_dim=32),
        output_resampler=QwenResamplerConfig(
            grid_size=2, num_queries_override=iv,
            embed_dim=32, num_heads=4, kv_dim=llm.hidden_size),
    )
    agent = ContinuousLVLM.build(acfg, jax.random.key(5))
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
    return modules, agent, frozen, manga


def _stage3_batch(manga, agent_cfg, b=2, hw=32, sources=1):
    rng = np.random.default_rng(4)
    i = manga.max_num_ips
    nq = agent_cfg.input_resampler.num_queries
    L = 24
    ids_cmp = np.zeros((b, L), bool)
    ids_gen = np.zeros((b, L), bool)
    ids_cmp[:, 2:2 + nq] = True
    ids_gen[:, 12:12 + nq] = True
    labels = rng.integers(0, agent_cfg.llm.vocab_size, (b, L))
    labels[:, :12] = -100
    return {
        "pixel_values": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)),
                                    jnp.float32),
        "text_input_ids": jnp.asarray(rng.integers(1, 250, (b, 77)), jnp.int32),
        "text_input_ids_2": jnp.asarray(rng.integers(1, 250, (b, 77)),
                                        jnp.int32),
        "ip_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, sources, 224, 224, 3)), jnp.float32),
        "magi_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, sources, 224, 224, 3)), jnp.float32),
        "target_ip_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, 224, 224, 3)), jnp.float32),
        "target_magi_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, 224, 224, 3)), jnp.float32),
        "ip_exists": jnp.ones((b, i, sources), jnp.float32),
        "ip_bbox": jnp.asarray(rng.uniform(0, 1, (b, i, 4)), jnp.float32),
        "dialog_bbox": jnp.zeros((b, manga.max_num_dialogs, 4), jnp.float32),
        "original_size": jnp.full((b, 2), float(hw)),
        "crop_coords_top_left": jnp.zeros((b, 2)),
        "target_size": jnp.full((b, 2), float(hw)),
        "mllm_input_ids": jnp.asarray(
            rng.integers(0, agent_cfg.llm.vocab_size, (b, L)), jnp.int32),
        "mllm_labels": jnp.asarray(labels, jnp.int32),
        "ids_cmp_mask": jnp.asarray(ids_cmp),
        "ids_gen_mask": jnp.asarray(ids_gen),
        "embeds_cmp_mask": jnp.asarray([[True, False]] * b),
        "embeds_gen_mask": jnp.asarray([[False, True]] * b),
    }


def test_stage3_step_trains_agent_only(stage3):
    modules, agent, frozen, manga = stage3
    cfg = Stage3Config(manga=manga, mllm_loss_weight=0.5)
    frozen = frozen.replace(unet_params=modules.unet_params,
                            resampler_params=modules.resampler_params)
    step_fn = make_stage3_step(modules.unet, modules.resampler, agent,
                               DDPMSchedule(), cfg)
    params = {"llm": agent.llm_params,
              "input_resampler": agent.input_resampler_params,
              "output_resampler": agent.output_resampler_params}
    state = TrainState.create(params, make_optimizer(1e-3))
    batch = _stage3_batch(manga, agent.config)
    state2, metrics = jax.jit(step_fn)(state, frozen, batch,
                                       jax.random.key(0))
    for k in ("loss", "loss_diffusion", "loss_lm", "loss_rec"):
        assert np.isfinite(float(metrics[k])), k
    # every agent component received gradient
    for k in params:
        moved = any(bool(jnp.any(a != b)) for a, b in
                    zip(jax.tree.leaves(state.params[k]),
                        jax.tree.leaves(state2.params[k])))
        assert moved, f"{k} did not train"


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    root = os.fspath(tmp_path / "ckpts")
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    state = TrainState.create(params, make_optimizer(1e-2))
    mgr = CheckpointManager(root, total_limit=2)
    rng = jax.random.key(7)
    for step in (10, 20, 30):
        mgr.save(step, state.params, rng=rng)
    dirs = sorted(os.listdir(root))
    assert dirs == ["step-20", "step-30"]          # rotation dropped step-10
    assert latest_step_dir(root).endswith("step-30")

    restored, rng2, step = mgr.restore(
        jax.tree.map(jnp.zeros_like, params), with_rng=True)
    assert step == 30
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))
    assert rng2 is not None
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rng2)),
        np.asarray(jax.random.key_data(rng)))


def test_weights_export_load(tmp_path):
    path = os.fspath(tmp_path / "weights")
    params = {"unet": {"k": jnp.full((4, 4), 3.0)}}
    export_weights(path, params)
    loaded = load_weights(path, jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_array_equal(np.asarray(loaded["unet"]["k"]),
                                  np.asarray(params["unet"]["k"]))
