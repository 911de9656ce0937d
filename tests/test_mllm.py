"""MLLM agent tests: LLaMA forward/decode-cache parity, LoRA, QwenResampler,
ContinuousLVLM loss and ladder-constrained generation — all tiny, on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import AgentConfig, LlamaConfig, QwenResamplerConfig
from diffsensei_tpu.models.mllm.llama import (
    LlamaForCausalLM, cross_entropy_lm_loss, init_caches)
from diffsensei_tpu.models.mllm.qwen_resampler import (
    QwenResampler, get_2d_sincos_pos_embed)
from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size,
                                                        (2, 10)), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids)
    return cfg, model, params, ids


def test_llama_forward_shapes(tiny_llama):
    cfg, model, params, ids = tiny_llama
    logits, hidden, caches = model.apply(params, ids)
    assert logits.shape == (2, 10, cfg.vocab_size)
    assert hidden.shape == (2, 10, cfg.hidden_size)
    assert caches is None


def test_llama_cached_decode_matches_full_forward(tiny_llama):
    """Prefill + token-by-token cached decode == one full causal forward."""
    cfg, model, params, ids = tiny_llama
    b, s = ids.shape
    full_logits, _, _ = model.apply(params, ids)

    caches = init_caches(cfg, b, s)
    # prefill first 6 tokens
    pre = 6
    pos = jnp.broadcast_to(jnp.arange(pre)[None], (b, pre))
    logits, _, caches = model.apply(params, ids[:, :pre], positions=pos,
                                    caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits[:, :pre]),
                               rtol=2e-4, atol=2e-4)
    # decode the rest one token at a time
    for i in range(pre, s):
        pos = jnp.full((b, 1), i, jnp.int32)
        logits, _, caches = model.apply(params, ids[:, i:i + 1], positions=pos,
                                        caches=caches, cache_index=i)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, i]),
                                   rtol=2e-4, atol=2e-4)


def test_llama_lora_zero_init_is_identity(tiny_llama):
    cfg, base_model, base_params, ids = tiny_llama
    lora_model = LlamaForCausalLM(cfg, lora_rank=4)
    lora_params = lora_model.init(jax.random.key(0), input_ids=ids)
    # same rng -> same base kernels; lora_b zero-init -> identical output
    logits_base, _, _ = base_model.apply(base_params, ids)
    logits_lora, _, _ = lora_model.apply(lora_params, ids)
    np.testing.assert_allclose(np.asarray(logits_lora), np.asarray(logits_base),
                               rtol=1e-5, atol=1e-5)


def test_lm_loss_ignores_masked_labels():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[-100, 3, -100, 5]])
    loss = cross_entropy_lm_loss(logits, labels)
    # uniform logits -> loss = log(8) over the 2 valid positions
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


def test_qwen_resampler_shapes_and_posembed():
    pos = get_2d_sincos_pos_embed(16, 2)
    assert pos.shape == (4, 16)
    cfg = QwenResamplerConfig.tiny(embed_dim=32, kv_dim=16)
    model = QwenResampler(cfg)
    x = jnp.ones((3, 7, 16))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (3, cfg.num_queries, 32)


@pytest.fixture(scope="module")
def tiny_agent():
    cfg = AgentConfig.tiny()
    return cfg, ContinuousLVLM.build(cfg, jax.random.key(1))


def test_agent_loss(tiny_agent):
    cfg, agent = tiny_agent
    nq = cfg.input_resampler.num_queries      # 4
    b, n_img, L = 2, 2, 24
    d_in = cfg.input_resampler.kv_dim          # 32
    rng = np.random.default_rng(2)
    ids_cmp = np.zeros((b, L), bool)
    ids_gen = np.zeros((b, L), bool)
    ids_cmp[:, 2:2 + nq] = True               # first img block: comprehension
    ids_gen[:, 10:10 + nq] = True             # second img block: generation
    labels = rng.integers(0, cfg.llm.vocab_size, (b, L))
    labels[:, :10] = -100
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.llm.vocab_size, (b, L)),
                                 jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "image_embeds": jnp.asarray(
            rng.normal(size=(b, n_img, nq, d_in)), jnp.float32),
        "embeds_cmp_mask": jnp.asarray([[True, False]] * b),
        "embeds_gen_mask": jnp.asarray([[False, True]] * b),
        "ids_cmp_mask": jnp.asarray(ids_cmp),
        "ids_gen_mask": jnp.asarray(ids_gen),
    }
    params = {"llm": agent.llm_params,
              "input_resampler": agent.input_resampler_params,
              "output_resampler": agent.output_resampler_params}
    total, aux = jax.jit(agent.loss)(params, batch)
    assert np.isfinite(float(total))
    assert float(aux["rec_loss"]) > 0
    assert aux["recon_image_embeds"].shape == (
        b, cfg.output_resampler.num_queries, cfg.output_resampler.embed_dim)

    # grads flow to all three components
    grads = jax.grad(lambda p: agent.loss(p, batch)[0])(params)
    for k in params:
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads[k]))
        assert gnorm > 0, f"no grad into {k}"


def test_agent_generate_forces_ladder(tiny_agent):
    cfg, agent = tiny_agent
    nq = cfg.input_resampler.num_queries
    vocab = cfg.llm.vocab_size
    # reserve top-of-vocab ids as the ladder: [boi, img_0..img_{nq-1}, eoi]
    ladder = np.arange(vocab - nq - 2, vocab, dtype=np.int64)
    boi = int(ladder[0])
    prompt = np.asarray([[5, 9, 17, boi]], np.int32)   # ends with <img>
    out = agent.generate(prompt, ladder_ids=ladder,
                         max_new_tokens=nq + 4)
    ids = out["output_ids"][0]
    # forced: <img_0>..<img_{nq-1}>, </img> right after the prompt's <img>
    np.testing.assert_array_equal(ids[:nq + 1], ladder[1:])
    assert out["num_gen_imgs"] == 1
    assert out["img_gen_feat"].shape == (
        1, cfg.output_resampler.num_queries, cfg.output_resampler.embed_dim)
