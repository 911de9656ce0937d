"""PEFT mask selection, vocab resize, LLM TP forward, multi-chip inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffsensei_tpu.core.config import LlamaConfig
from diffsensei_tpu.models.mllm.llama import LlamaForCausalLM
from diffsensei_tpu.models.mllm.peft import (
    later_layers_mask, lora_trainable_mask, resize_vocab, suffix_trainable_mask)
from diffsensei_tpu.parallel.mesh import (
    MeshSpec, llm_param_sharding_rules, make_mesh, param_specs, shard_params)
from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline, PipelineModules
from diffsensei_tpu.train.optim import count_params


@pytest.fixture(scope="module")
def lora_llama():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, lora_rank=2)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids)
    return cfg, model, params


def test_lora_mask_selects_adapters_and_norms(lora_llama):
    cfg, model, params = lora_llama
    mask = lora_trainable_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, flag in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        if "lora_a" in name or "lora_b" in name:
            assert flag, name
        if "base.kernel" in name:
            assert not flag, name
        if "embed_tokens" in name or "lm_head" in name:
            assert flag, name
    assert 0 < count_params(params, mask) < count_params(params)


def test_later_layers_mask(lora_llama):
    cfg, model, params = lora_llama
    mask = later_layers_mask(params, cfg.num_layers, train_last=1)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, flag in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        if "layers_0" in name:
            assert not flag, name
        elif "layers_1" in name:
            assert flag, name


def test_suffix_mask(lora_llama):
    _, _, params = lora_llama
    mask = suffix_trainable_mask(params, ["q_proj"])
    n = count_params(params, mask)
    assert n > 0
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, flag in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        assert flag == ("q_proj" in name), name


def test_resize_vocab(lora_llama):
    cfg, model, params = lora_llama
    params = jax.tree.map(np.asarray, params)
    grown = resize_vocab(jax.tree.map(np.array, params), cfg.vocab_size + 6)
    emb = grown["params"]["embed_tokens"]["embedding"]
    assert emb.shape[0] == cfg.vocab_size + 6
    np.testing.assert_allclose(emb[-1], emb[: cfg.vocab_size].mean(0),
                               rtol=1e-5)
    head = grown["params"]["lm_head"]["kernel"]
    assert head.shape[1] == cfg.vocab_size + 6


def test_llm_tensor_parallel_forward(eight_devices):
    """TP over the model axis: sharded params, same logits as replicated."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 12)), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids)
    want, _, _ = model.apply(params, ids)

    mesh = make_mesh(MeshSpec(data=2, model=4), eight_devices)
    sharded = shard_params(params, mesh, llm_param_sharding_rules())
    with mesh:
        got, _, _ = jax.jit(lambda p, i: model.apply(p, i))(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # check the rules actually shard something over the model axis
    specs = param_specs(params, llm_param_sharding_rules())
    assert any("model" in str(s) for s in jax.tree.leaves(
        jax.tree.map(str, specs)))


def test_multichip_batched_inference(eight_devices):
    """BASELINE config #5: bucketed batch inference on an 8-device mesh."""
    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    modules = PipelineModules.tiny(jax.random.key(0))
    pipe = DiffSenseiPipeline(modules, mesh=mesh)
    rng = np.random.default_rng(0)
    ids = lambda: jnp.asarray(rng.integers(1, 255, (1, 77)), jnp.int32)
    with mesh:
        latents = pipe(
            height=64, width=64, num_inference_steps=2, num_samples=8,
            rng=jax.random.key(1),
            prompt_ids=dict(ids=ids(), neg_ids=ids(), ids_2=ids(),
                            neg_ids_2=ids()),
            ip_pixel_values=jnp.zeros((2, 224, 224, 3)),
            ip_bbox=[[0, 0, .5, 1], [.5, 0, 1, 1]],
            snap_to_buckets=False, return_latents=True)
    assert latents.shape == (8, 8, 8, 4)
    assert bool(jnp.isfinite(latents).all())
