"""check_inputs validation, ip_adapter_plus=False stage-2 path, serve CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffsensei_tpu.models.projection import ImageProjDummyModel
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline, PipelineModules
from diffsensei_tpu.train.diffusion import (
    FrozenDiffusionStack, Stage2Config, TrainState, make_stage2_step)
from diffsensei_tpu.train.optim import make_optimizer

from tests.test_train import _stage2_batch


@pytest.fixture(scope="module")
def modules():
    return PipelineModules.tiny(jax.random.key(0))


def test_check_inputs_contract(modules):
    pipe = DiffSenseiPipeline(modules)
    manga = modules.manga
    with pytest.raises(ValueError, match="max_num_ips"):
        pipe.check_inputs("p", None, None,
                          [[0, 0, 1, 1]] * (manga.max_num_ips + 1), None, 1)
    with pytest.raises(ValueError, match="max_num_dialogs"):
        pipe.check_inputs("p", None, None, None,
                          [[0, 0, 1, 1]] * (manga.max_num_dialogs + 1), 1)
    with pytest.raises(ValueError, match="string"):
        pipe.check_inputs(123, None, None, None, None, 1)
    with pytest.raises(ValueError, match="bboxes"):
        pipe.check_inputs("p", jnp.zeros((1, 224, 224, 3)), None, [], None, 1)
    # padded-to-max images with fewer bboxes are fine (serving layer contract)
    pipe.check_inputs("p", jnp.zeros((manga.max_num_ips, 224, 224, 3)),
                      None, [[0, 0, 1, 1]], None, 1)


def test_stage2_linear_projection_path(modules):
    """ip_adapter_plus=False trains ImageProjDummyModel on pooled features."""
    manga = modules.manga
    frozen = FrozenDiffusionStack(
        vae=modules.vae, vae_params=modules.vae_params,
        text_encoder=modules.text_encoder,
        text_encoder_params=modules.text_encoder_params,
        text_encoder_2=modules.text_encoder_2,
        text_encoder_2_params=modules.text_encoder_2_params,
        image_encoder=modules.image_encoder,
        image_encoder_params=modules.image_encoder_params,
        magi_encoder=modules.magi_encoder,
        magi_encoder_params=modules.magi_encoder_params)
    proj = ImageProjDummyModel(
        cross_attention_dim=modules.unet.config.cross_attention_dim,
        num_tokens=manga.num_vision_tokens,
        num_dummy_tokens=manga.num_dummy_tokens)
    clip_dim = modules.image_encoder.config.hidden_size
    magi_dim = modules.magi_encoder.config.hidden_size
    proj_params = proj.init(
        jax.random.key(1),
        jnp.zeros((1, manga.max_num_ips, clip_dim)),
        jnp.zeros((1, manga.max_num_ips, magi_dim)))

    cfg = Stage2Config(manga=manga, ip_adapter_plus=False)
    step_fn = make_stage2_step(modules.unet, proj, DDPMSchedule(), cfg)
    state = TrainState.create(
        {"unet": modules.unet_params, "resampler": proj_params},
        make_optimizer(1e-4))
    state2, metrics = jax.jit(step_fn)(state, frozen, _stage2_batch(manga),
                                       jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_serve_cli_generates_png(tmp_path):
    from diffsensei_tpu.serve.cli import main
    char = tmp_path / "char.png"
    Image.new("RGB", (60, 90), (50, 60, 70)).save(char)
    out = tmp_path / "panel.png"
    main(["--preset", "tiny", "--prompt", "a hero", "--height", "64",
          "--width", "64", "--steps", "1", "--char-image", os.fspath(char),
          "--ip-bbox", "0,0,0.5,1", "--out", os.fspath(out)])
    img = Image.open(out)
    assert img.size[0] % 8 == 0 and img.size[1] % 8 == 0


def test_serve_cli_context_parallel_flag(tmp_path):
    """--context-parallel builds the mesh and routes through the CP pipeline
    (the ring path itself is parity-tested in test_ring_attention.py; at tiny
    panel sizes no attention reaches cp_min_seq, so this is the wiring/flag
    smoke path)."""
    from diffsensei_tpu.serve.cli import main
    out = tmp_path / "panel_cp.png"
    main(["--preset", "tiny", "--prompt", "a hero", "--height", "64",
          "--width", "64", "--steps", "1", "--context-parallel",
          "--out", os.fspath(out)])
    # serving snaps to the bucket grid (smallest bucket 256) — CP must not
    # change the snap behavior, only the attention sharding.
    assert Image.open(out).size == (256, 256)


def test_serve_cli_quantize_unet_flag(tmp_path):
    """--quantize-unet converts the loaded UNet tree to the int8 serving
    layout (models/quant_unet.py) and generation still produces a panel —
    the single-chip co-residence mode (reference gradio.py:255-283 serves
    agent + pipeline from one device)."""
    import jax.numpy as jnp

    import diffsensei_tpu.serve.api as api
    from diffsensei_tpu.serve.cli import main

    captured = {}
    real = api.DiffSenseiServer

    class Recording(real):
        def __init__(self, pipeline, **kw):
            captured["unet"] = pipeline.m.unet
            captured["params"] = pipeline.m.unet_params
            super().__init__(pipeline, **kw)

    out = tmp_path / "panel_q.png"
    import unittest.mock as mock
    with mock.patch.object(api, "DiffSenseiServer", Recording):
        main(["--preset", "tiny", "--prompt", "a hero", "--height", "64",
              "--width", "64", "--steps", "1", "--quantize-unet",
              "--out", os.fspath(out)])
    assert captured["unet"].quantized
    node = captured["params"]["params"]["mid_attn"]["blocks_0"]["attn1"]
    assert node["to_q"]["kernel_q"].dtype == jnp.int8
    assert Image.open(out).size == (256, 256)


def test_auto_batch_policy_same_panels_per_seed(modules):
    """Serving policy (VERDICT r4 next #4): multi-sample requests batch at
    <=512px buckets and run sequentially above (docs/PERF.md "Batching
    panels") — and the mode must NEVER change what a seed produces. Both
    modes share one latent draw via the pipeline's ``latents=`` passthrough;
    outputs agree to numerical tolerance (batch-N vs batch-1 programs tile
    reductions differently)."""
    from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline
    from diffsensei_tpu.serve.api import DiffSenseiServer, GenerationRequest

    pipe = DiffSenseiPipeline(modules)
    ids = {k: jnp.zeros((1, 77), jnp.int32)
           for k in ("ids", "neg_ids", "ids_2", "neg_ids_2")}
    req = GenerationRequest(prompt="", height=256, width=256,
                            num_inference_steps=2, num_samples=2, seed=7,
                            prompt_ids=ids)
    batched = DiffSenseiServer(pipe, auto_batch_max_side=512).generate(req)
    sequential = DiffSenseiServer(pipe, auto_batch_max_side=64).generate(req)
    assert batched.shape == sequential.shape == (2, 256, 256, 3)
    np.testing.assert_allclose(batched, sequential, rtol=2e-4, atol=2e-4)
    # the two samples are distinct draws, not copies
    assert np.abs(batched[0] - batched[1]).max() > 1e-3
