"""Int8 weight-only quantization of the SEED-X LLM (models/mllm/quant.py).

The serving lever that fits the 13B-class LLaMA (reference
``scripts/demo/gradio.py:257-270`` serves it fp16 on a large-HBM GPU) on a
single 16 GB v5e: per-output-channel int8 weights + fp32 scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.core.config import AgentConfig
from diffsensei_tpu.models.mllm.llama import LlamaForCausalLM
from diffsensei_tpu.models.mllm.quant import (
    merge_llm_lora, quantize_agent, quantize_kernel, quantize_llm_params)
from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM


def _tiny_agent(lora_rank=0, seed=0):
    return ContinuousLVLM.build(AgentConfig.tiny(), jax.random.key(seed),
                                dtype=jnp.float32, lora_rank=lora_rank)


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.03, (64, 48)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.dtype == np.float32
    deq = q.astype(np.float32) * s[None, :]
    # symmetric rounding error is at most half a quantization step per entry
    assert np.max(np.abs(deq - w)) <= 0.5 * np.max(s) + 1e-7
    # zero column must not produce NaNs
    w[:, 3] = 0.0
    q, s = quantize_kernel(w)
    assert np.all(q[:, 3] == 0) and np.isfinite(s).all()


def test_quantized_logits_match_fp32():
    agent = _tiny_agent()
    qagent = quantize_agent(agent)
    ids = np.arange(1, 13, dtype=np.int32)[None]
    logits, hidden, _ = agent.llm.apply(agent.llm_params, jnp.asarray(ids))
    qlogits, qhidden, _ = qagent.llm.apply(qagent.llm_params, jnp.asarray(ids))
    l, ql = np.asarray(logits, np.float64), np.asarray(qlogits, np.float64)
    cos = (l * ql).sum() / (np.linalg.norm(l) * np.linalg.norm(ql))
    assert cos > 0.999, cos
    rel = np.abs(ql - l).max() / (np.abs(l).max() + 1e-9)
    assert rel < 0.05, rel


def test_merge_llm_lora_folds_adapters():
    agent = _tiny_agent(lora_rank=4)
    params = jax.tree.map(lambda x: x, agent.llm_params)
    # make one adapter non-trivial (init has B=0 -> merge would be identity)
    node = params["params"]["layers_0"]["attn"]["q_proj"]
    node["lora_b"] = jnp.ones_like(node["lora_b"]) * 0.01
    ids = jnp.asarray(np.arange(1, 9, dtype=np.int32)[None])
    ref_logits, _, _ = agent.llm.apply(params, ids)

    merged = merge_llm_lora(params)
    flat = jax.tree_util.tree_flatten_with_path(merged)[0]
    assert not any("lora" in str(p) for p, _ in flat)
    llm0 = LlamaForCausalLM(agent.llm.config, lora_rank=0,
                            dtype=jnp.float32, param_dtype=jnp.float32)
    merged_logits, _, _ = llm0.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(merged_logits),
                               np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_quantized_param_structure_and_passthrough():
    agent = _tiny_agent()
    q = quantize_llm_params(agent.llm_params)
    p = q["params"]
    base = p["layers_0"]["attn"]["q_proj"]["base"]
    assert set(base) == {"kernel_q", "kernel_scale"}
    assert base["kernel_q"].dtype == jnp.int8
    assert set(p["lm_head"]) == {"kernel_q", "kernel_scale"}
    # embeddings and norms pass through bit-identical
    np.testing.assert_array_equal(
        np.asarray(p["embed_tokens"]["embedding"]),
        np.asarray(agent.llm_params["params"]["embed_tokens"]["embedding"]))
    np.testing.assert_array_equal(
        np.asarray(p["norm"]["weight"]),
        np.asarray(agent.llm_params["params"]["norm"]["weight"]))


def test_quantized_generate_ladder_fires():
    agent = quantize_agent(_tiny_agent())
    cfg = agent.config
    nq = cfg.input_resampler.num_queries
    vocab = cfg.llm.vocab_size
    ladder = np.arange(vocab - nq - 2, vocab, dtype=np.int64)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, vocab - nq - 4, (1, 8)).astype(np.int32)
    prompt[0, -1] = int(ladder[0])
    image_embeds = jnp.asarray(
        rng.normal(size=(1, 5, cfg.input_resampler.kv_dim)), jnp.float32)
    mask = np.zeros((1, 8), bool)
    mask[0, 1:1 + nq] = True
    out = agent.generate(prompt, image_embeds=image_embeds,
                         ids_cmp_mask=jnp.asarray(mask), ladder_ids=ladder,
                         max_new_tokens=nq + 4)
    assert out["num_gen_imgs"] >= 1
    assert out["img_gen_feat"].shape[1] == cfg.output_resampler.num_queries


def test_quantized_build_random_init_runs():
    agent = ContinuousLVLM.build(AgentConfig.tiny(), jax.random.key(0),
                                 dtype=jnp.float32, quantized=True)
    base = agent.llm_params["params"]["layers_0"]["mlp"]["gate_proj"]["base"]
    assert base["kernel_q"].dtype == jnp.int8
    logits, _, _ = agent.llm.apply(
        agent.llm_params, jnp.asarray(np.arange(1, 9, dtype=np.int32)[None]))
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_abstract_build_port_quantize_serving_path(tmp_path):
    """The serve/cli.py --quantize-llm flow: abstract build (no param
    materialization — the 13B tree cannot be random-initialized on chip),
    port a torch agent checkpoint, quantize, and decode."""
    import os

    import torch

    from diffsensei_tpu.utils import export_torch
    from diffsensei_tpu.utils.load import load_agent_weights

    acfg = AgentConfig.tiny()
    src = ContinuousLVLM.build(acfg, jax.random.key(1), lora_rank=2)
    sd = export_torch.export_agent_ckpt(
        src.llm_params, src.input_resampler_params,
        src.output_resampler_params, acfg.llm.num_layers)
    path = tmp_path / "pytorch_model.bin"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    dst = ContinuousLVLM.build(acfg, jax.random.key(0), lora_rank=2,
                               abstract=True)
    assert isinstance(jax.tree_util.tree_leaves(dst.llm_params)[0],
                      jax.ShapeDtypeStruct)
    dst = load_agent_weights(dst, os.fspath(path))
    qagent = quantize_agent(dst)

    ids = jnp.asarray(np.arange(1, 9, dtype=np.int32)[None])
    ref, _, _ = src.llm.apply(src.llm_params, ids)
    got, _, _ = qagent.llm.apply(qagent.llm_params, ids)
    r, g = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    assert cos > 0.999, cos


def test_serve_cli_quantize_llm_wiring(tmp_path, monkeypatch):
    """serve/cli.py --quantize-llm end-to-end on the tiny preset: abstract
    build → torch-ckpt port → int8 quantize → server receives the quantized
    agent (and panel generation still works)."""
    import os

    import torch

    import diffsensei_tpu.serve.api as api
    from diffsensei_tpu.serve import cli
    from diffsensei_tpu.utils import export_torch

    acfg = AgentConfig.tiny()
    src = ContinuousLVLM.build(acfg, jax.random.key(1))  # config lora rank
    sd = export_torch.export_agent_ckpt(
        src.llm_params, src.input_resampler_params,
        src.output_resampler_params, acfg.llm.num_layers)
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, ckpt)

    captured = {}
    real_server = api.DiffSenseiServer

    class Recording(real_server):
        def __init__(self, *a, **kw):
            captured["agent"] = kw.get("agent")
            super().__init__(*a, **kw)

    monkeypatch.setattr(api, "DiffSenseiServer", Recording)
    out = os.fspath(tmp_path / "panel.png")
    cli.main(["--preset", "tiny", "--height", "256", "--width", "256",
              "--steps", "2", "--prompt", "a hero",
              "--agent-weights", os.fspath(ckpt), "--quantize-llm",
              "--out", out])

    agent = captured["agent"]
    assert agent is not None and agent.llm.quantized
    base = agent.llm_params["params"]["layers_0"]["attn"]["q_proj"]["base"]
    assert base["kernel_q"].dtype == jnp.int8
    # values match the direct merge+quantize of the source agent
    expect = quantize_agent(src)
    np.testing.assert_array_equal(
        np.asarray(base["kernel_q"]),
        np.asarray(expect.llm_params["params"]["layers_0"]["attn"]["q_proj"]
                   ["base"]["kernel_q"]))
    assert os.path.exists(out)


def test_quantize_agent_rejects_abstract_tree():
    agent = ContinuousLVLM.build(AgentConfig.tiny(), jax.random.key(0),
                                 abstract=True)
    with pytest.raises(ValueError, match="abstract"):
        quantize_agent(agent)


def test_quantized_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P
    from diffsensei_tpu.parallel.mesh import (
        llm_param_sharding_rules, spec_for)
    rules = llm_param_sharding_rules()
    assert spec_for("params.layers_0.attn.q_proj.base.kernel_q",
                    rules) == P(None, "model")
    assert spec_for("params.layers_0.attn.q_proj.base.kernel_scale",
                    rules) == P("model")
    assert spec_for("params.layers_0.mlp.down_proj.base.kernel_q",
                    rules) == P("model", None)
    assert spec_for("params.layers_0.mlp.down_proj.base.kernel_scale",
                    rules) == P()
    assert spec_for("params.lm_head.kernel_q", rules) == P(None, "model")


# ---------------------------------------------------------------------------
# UNet weight-only int8 (models/quant_unet.py + UNetMangaModel(quantized=True))
# — the other half of the single-chip co-residence story: the reference
# serves agent + diffusion pipeline from ONE device (gradio.py:255-283).
# ---------------------------------------------------------------------------
def _tiny_unet(lora_rank=0, quantized=False, seed=0):
    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.unet import UNetMangaModel
    from tests.test_models import _unet_inputs
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(), lora_rank=lora_rank)
    model = UNetMangaModel(cfg, quantized=quantized)
    inputs = _unet_inputs(cfg)
    return cfg, model, inputs


def test_quantize_unet_params_layout_matches_quantized_init():
    """Converter output must be loadable by UNetMangaModel(quantized=True):
    identical tree structure, shapes and dtypes as that model's own init."""
    from diffsensei_tpu.models.quant_unet import quantize_unet_params
    from diffsensei_tpu.models.unet import UNetMangaModel

    cfg, model, inputs = _tiny_unet()
    params = model.init(jax.random.key(0), **inputs)
    qparams = quantize_unet_params(params)

    qmodel = UNetMangaModel(cfg, quantized=True)
    tmpl = jax.eval_shape(lambda k: qmodel.init(k, **inputs), jax.random.key(1))
    got = jax.tree.map(lambda x: (x.shape, str(x.dtype)), qparams)
    want = jax.tree.map(lambda x: (x.shape, str(x.dtype)), tmpl)
    assert got == want


def test_quantized_unet_output_close_to_fp32():
    from diffsensei_tpu.models.quant_unet import quantize_unet_params
    from diffsensei_tpu.models.unet import UNetMangaModel

    cfg, model, inputs = _tiny_unet()
    params = model.init(jax.random.key(0), **inputs)
    ref = np.asarray(model.apply(params, **inputs), np.float64)

    qmodel = UNetMangaModel(cfg, quantized=True)
    got = np.asarray(qmodel.apply(quantize_unet_params(params), **inputs),
                     np.float64)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999, cos
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_unet_merges_lora_first():
    """A LoRA-trained UNet tree quantizes to the rank-0 serving layout and
    reproduces the MERGED model (adapters folded, not dropped)."""
    from diffsensei_tpu.models.lora import merge_lora_params
    from diffsensei_tpu.models.quant_unet import quantize_unet_params
    from diffsensei_tpu.models.unet import UNetMangaModel

    cfg, model, inputs = _tiny_unet(lora_rank=2)
    params = model.init(jax.random.key(0), **inputs)
    # make one adapter non-trivial (B=0 init would make merge an identity)
    node = params["params"]["mid_attn"]["blocks_0"]["attn1"]["to_q"]
    node["lora_b"] = jnp.ones_like(node["lora_b"]) * 0.02

    import dataclasses

    cfg0 = dataclasses.replace(cfg, lora_rank=0)
    merged_ref = np.asarray(
        UNetMangaModel(cfg0).apply(merge_lora_params(params), **inputs),
        np.float64)

    qparams = quantize_unet_params(params)
    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    assert not any("lora" in str(p) for p, _ in flat)
    got = np.asarray(
        UNetMangaModel(cfg0, quantized=True).apply(qparams, **inputs),
        np.float64)
    cos = (merged_ref * got).sum() / (
        np.linalg.norm(merged_ref) * np.linalg.norm(got))
    assert cos > 0.999, cos


def test_quantize_unet_leaves_convs_alone():
    from diffsensei_tpu.models.quant_unet import quantize_unet_params

    cfg, model, inputs = _tiny_unet()
    params = model.init(jax.random.key(0), **inputs)
    q = quantize_unet_params(params)["params"]
    p = params["params"]
    np.testing.assert_array_equal(np.asarray(q["conv_in"]["kernel"]),
                                  np.asarray(p["conv_in"]["kernel"]))
    # attention projections converted; GEGLU ffn converted
    blk = q["mid_attn"]["blocks_0"]
    assert set(blk["attn1"]["to_q"]) == {"kernel_q", "kernel_scale"}
    assert set(blk["attn2"]["to_k_ip"]) == {"kernel_q", "kernel_scale"}
    assert "kernel_q" in blk["ff"]["proj_in"]
    assert "kernel_q" in q["mid_attn"]["proj_in"]
    # resnet time projection (2-D kernel, non-target name) passes through
    res = q["mid_resnet_0"]
    np.testing.assert_array_equal(
        np.asarray(res["time_emb_proj"]["kernel"]),
        np.asarray(p["mid_resnet_0"]["time_emb_proj"]["kernel"]))


# ---------------------------------------------------------------------------
# int4 group-wise LLM quantization (models/mllm/llama.py::Int4Dense) — the
# co-residence lever: 13B weights drop to ~6.1 GiB so agent + diffusion
# stack fit ONE 16 GB chip (reference serves both from one device,
# gradio.py:255-283), and the bandwidth-bound decode reads half the bytes
# of int8.
# ---------------------------------------------------------------------------
def test_quantize_kernel_int4_roundtrip():
    from diffsensei_tpu.models.mllm.quant import quantize_kernel_int4
    from diffsensei_tpu.ops.int4_matmul import unpack_int4

    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.03, (256, 48)).astype(np.float32)
    q, s = quantize_kernel_int4(w, group=128)
    # in=256 / g=128 is kernel-eligible → features pad 48 → 256, packed ÷2
    assert q.shape == (256, 128) and q.dtype == np.uint8
    assert s.shape == (2, 256)
    nib = np.asarray(unpack_int4(jnp.asarray(q)))
    assert nib.min() >= -7 and nib.max() <= 7
    deq = nib.astype(np.float32).reshape(2, 128, 256) * s[:, None, :]
    err = np.abs(deq.reshape(256, 256)[:, :48] - w)
    assert err.max() <= 0.5 * s.max() + 1e-7
    assert np.all(deq.reshape(256, 256)[:, 48:] == 0)  # pad columns zero
    # zero group must not produce NaNs
    w[:128, 3] = 0.0
    q, s = quantize_kernel_int4(w, group=128)
    nib = np.asarray(unpack_int4(jnp.asarray(q)))
    assert np.isfinite(s).all() and np.all(nib[:128, 3] == 0)


def test_int4_logits_close_to_fp32():
    agent = _tiny_agent()
    q4 = quantize_agent(agent, bits=4)
    assert str(q4.llm.quantized) == "int4"
    base = q4.llm_params["params"]["layers_0"]["attn"]["q_proj"]["base"]
    assert base["kernel_q"].dtype == jnp.uint8    # nibble-packed two-per-byte
    assert base["kernel_scale"].ndim == 2
    ids = np.arange(1, 13, dtype=np.int32)[None]
    ref, _, _ = agent.llm.apply(agent.llm_params, jnp.asarray(ids))
    got, _, _ = q4.llm.apply(q4.llm_params, jnp.asarray(ids))
    r, g = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    # RTN int4 carries ~10-14% weight noise by construction (step = absmax/7
    # ~= 0.5 sigma on random normal weights) -- logits track direction but
    # NOT the int8-level 0.999 cosine; this bound documents the real trade.
    assert cos > 0.9, cos


def test_int4_decode_and_prefill_paths_agree():
    """Int4Dense lowers decode (<=16 tokens, grouped contraction) and prefill
    (dequant matmul) differently; both must compute the same function."""
    from diffsensei_tpu.models.mllm.llama import Int4Dense

    rng = np.random.default_rng(1)
    layer = Int4Dense(24, group=16, dtype=jnp.float32)
    params = layer.init(jax.random.key(0), jnp.zeros((1, 1, 64)))
    x = jnp.asarray(rng.normal(size=(2, 20, 64)), jnp.float32)  # prefill path
    y_pre = layer.apply(params, x)
    y_dec = jnp.concatenate(  # same rows through the decode path
        [layer.apply(params, x[:, i:i + 1]) for i in range(20)], axis=1)
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_dec),
                               rtol=2e-5, atol=2e-5)


def test_int4_generate_ladder_fires():
    agent = quantize_agent(_tiny_agent(), bits=4)
    cfg = agent.config
    nq = cfg.input_resampler.num_queries
    vocab = cfg.llm.vocab_size
    ladder = np.arange(vocab - nq - 2, vocab, dtype=np.int64)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, vocab - nq - 4, (1, 8)).astype(np.int32)
    prompt[0, -1] = int(ladder[0])
    image_embeds = jnp.asarray(
        rng.normal(size=(1, 5, cfg.input_resampler.kv_dim)), jnp.float32)
    mask = np.zeros((1, 8), bool)
    mask[0, 1:1 + nq] = True
    out = agent.generate(prompt, image_embeds=image_embeds,
                         ids_cmp_mask=jnp.asarray(mask), ladder_ids=ladder,
                         max_new_tokens=nq + 4)
    assert out["num_gen_imgs"] >= 1
