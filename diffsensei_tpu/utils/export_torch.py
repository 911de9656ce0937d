"""Export JAX param pytrees → reference-layout torch state dicts (numpy).

Inverse of ``utils/port_torch``: emits the exact key layouts the reference
loads (``scripts/demo/gradio.py:229-283``, ``src/models/utils.py:22-72``) so
checkpoints trained here can be consumed by the reference stack, and so the
porters can be round-trip tested without the released artifact:

* ``export_sdxl_unet_sd``  — diffusers ``UNet2DConditionModel`` names; masked-IP
  projections live under ``attn2.processor.to_{k,v}_ip.weight`` exactly as a
  released full-UNet ``pytorch_model.bin`` stores processor params, plus the
  top-level ``dialog_bbox_embedding``.
* ``export_vae_sd``        — diffusers ``AutoencoderKL`` names.
* ``export_resampler_sd``  — reference ``Resampler`` names (``image_proj_model/
  pytorch_model.bin`` layout, ``src/models/resampler.py:79-143``).
* ``export_ip_adapter_sd`` — the ``{"image_proj", "ip_adapter"}`` split with
  ``{idx}.to_{k,v}_ip.weight`` keyed by attn-processor ModuleList position.

All values are numpy arrays (framework-neutral); feed to ``torch.save`` or
``safetensors.numpy.save_file`` as needed.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from diffsensei_tpu.utils.port_torch import attn_processor_slots


def _a(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lin(dst: Dict, name: str, node: Dict) -> None:
    dst[f"{name}.weight"] = _a(node["kernel"]).T
    if "bias" in node:
        dst[f"{name}.bias"] = _a(node["bias"])


def _conv(dst: Dict, name: str, node: Dict) -> None:
    dst[f"{name}.weight"] = _a(node["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in node:
        dst[f"{name}.bias"] = _a(node["bias"])


def _norm(dst: Dict, name: str, node: Dict) -> None:
    dst[f"{name}.weight"] = _a(node["scale"])
    dst[f"{name}.bias"] = _a(node["bias"])


def _export_resnet(dst: Dict, base: str, node: Dict) -> None:
    _norm(dst, base + "norm1", node["norm1"])
    _conv(dst, base + "conv1", node["conv1"])
    _norm(dst, base + "norm2", node["norm2"])
    _conv(dst, base + "conv2", node["conv2"])
    if "time_emb_proj" in node:
        _lin(dst, base + "time_emb_proj", node["time_emb_proj"])
    if "conv_shortcut" in node:
        _conv(dst, base + "conv_shortcut", node["conv_shortcut"])


def _export_transformer(dst: Dict, base: str, node: Dict, num_layers: int,
                        ip_in_processor: bool) -> None:
    _norm(dst, base + "norm", node["norm"])
    _lin(dst, base + "proj_in", node["proj_in"])
    _lin(dst, base + "proj_out", node["proj_out"])
    for k in range(num_layers):
        blk = node[f"blocks_{k}"]
        tb = f"{base}transformer_blocks.{k}."
        _norm(dst, tb + "norm1", blk["norm1"])
        _norm(dst, tb + "norm2", blk["norm2"])
        _norm(dst, tb + "norm3", blk["norm3"])
        for attn in ("attn1", "attn2"):
            a = blk[attn]
            _lin(dst, f"{tb}{attn}.to_q", a["to_q"])
            _lin(dst, f"{tb}{attn}.to_k", a["to_k"])
            _lin(dst, f"{tb}{attn}.to_v", a["to_v"])
            _lin(dst, f"{tb}{attn}.to_out.0", a["to_out"])
        if "to_k_ip" in blk["attn2"]:
            ip_base = (f"{tb}attn2.processor." if ip_in_processor
                       else f"{tb}attn2.")
            _lin(dst, ip_base + "to_k_ip", blk["attn2"]["to_k_ip"])
            _lin(dst, ip_base + "to_v_ip", blk["attn2"]["to_v_ip"])
        _lin(dst, tb + "ff.net.0.proj", blk["ff"]["proj_in"])
        _lin(dst, tb + "ff.net.2", blk["ff"]["proj_out"])


def export_sdxl_unet_sd(params: Dict, cfg, *,
                        ip_in_processor: bool = True) -> Dict[str, np.ndarray]:
    """Full UNet state dict. ``ip_in_processor=True`` emits the released
    ``pytorch_model.bin`` layout (processor params under ``attn2.processor.``);
    False emits merged ``attn2.to_{k,v}_ip`` names."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    tl = cfg.transformer_layers_per_block
    n_levels = len(cfg.block_out_channels)

    _conv(sd, "conv_in", p["conv_in"])
    _lin(sd, "time_embedding.linear_1", p["time_embedding"]["linear_1"])
    _lin(sd, "time_embedding.linear_2", p["time_embedding"]["linear_2"])
    _lin(sd, "add_embedding.linear_1", p["add_embedding"]["linear_1"])
    _lin(sd, "add_embedding.linear_2", p["add_embedding"]["linear_2"])

    for level in range(n_levels):
        for j in range(cfg.layers_per_block):
            _export_resnet(sd, f"down_blocks.{level}.resnets.{j}.",
                           p[f"down_{level}_resnet_{j}"])
            if tl[level] > 0:
                _export_transformer(
                    sd, f"down_blocks.{level}.attentions.{j}.",
                    p[f"down_{level}_attn_{j}"], tl[level], ip_in_processor)
        if level < n_levels - 1:
            _conv(sd, f"down_blocks.{level}.downsamplers.0.conv",
                  p[f"down_{level}_downsample"]["conv"])

    _export_resnet(sd, "mid_block.resnets.0.", p["mid_resnet_0"])
    _export_resnet(sd, "mid_block.resnets.1.", p["mid_resnet_1"])
    _export_transformer(sd, "mid_block.attentions.0.", p["mid_attn"],
                        cfg.mid_transformer_layers, ip_in_processor)

    for rev, level in enumerate(reversed(range(n_levels))):
        for j in range(cfg.layers_per_block + 1):
            _export_resnet(sd, f"up_blocks.{rev}.resnets.{j}.",
                           p[f"up_{rev}_resnet_{j}"])
            if tl[level] > 0:
                _export_transformer(
                    sd, f"up_blocks.{rev}.attentions.{j}.",
                    p[f"up_{rev}_attn_{j}"], tl[level], ip_in_processor)
        if level > 0:
            _conv(sd, f"up_blocks.{rev}.upsamplers.0.conv",
                  p[f"up_{rev}_upsample"]["conv"])

    _norm(sd, "conv_norm_out", p["conv_norm_out"])
    _conv(sd, "conv_out", p["conv_out"])
    if "dialog_bbox_embedding" in p:
        sd["dialog_bbox_embedding"] = _a(p["dialog_bbox_embedding"])
    return sd


def _export_vae_attn(dst: Dict, base: str, node: Dict) -> None:
    _norm(dst, base + "group_norm", node["group_norm"])
    _lin(dst, base + "to_q", node["to_q"])
    _lin(dst, base + "to_k", node["to_k"])
    _lin(dst, base + "to_v", node["to_v"])
    _lin(dst, base + "to_out.0", node["to_out"])


def export_vae_sd(params: Dict, cfg) -> Dict[str, np.ndarray]:
    p = params["params"]
    enc, dec = p["encoder"], p["decoder"]
    sd: Dict[str, np.ndarray] = {}
    n = len(cfg.block_out_channels)

    _conv(sd, "encoder.conv_in", enc["conv_in"])
    for level in range(n):
        for j in range(cfg.layers_per_block):
            _export_resnet(sd, f"encoder.down_blocks.{level}.resnets.{j}.",
                           enc[f"down_{level}_resnet_{j}"])
        if level < n - 1:
            _conv(sd, f"encoder.down_blocks.{level}.downsamplers.0.conv",
                  enc[f"down_{level}_downsample"]["conv"])
    _export_resnet(sd, "encoder.mid_block.resnets.0.", enc["mid_resnet_0"])
    _export_resnet(sd, "encoder.mid_block.resnets.1.", enc["mid_resnet_1"])
    _export_vae_attn(sd, "encoder.mid_block.attentions.0.", enc["mid_attn"])
    _norm(sd, "encoder.conv_norm_out", enc["conv_norm_out"])
    _conv(sd, "encoder.conv_out", enc["conv_out"])

    _conv(sd, "decoder.conv_in", dec["conv_in"])
    _export_resnet(sd, "decoder.mid_block.resnets.0.", dec["mid_resnet_0"])
    _export_resnet(sd, "decoder.mid_block.resnets.1.", dec["mid_resnet_1"])
    _export_vae_attn(sd, "decoder.mid_block.attentions.0.", dec["mid_attn"])
    for rev in range(n):
        for j in range(cfg.layers_per_block + 1):
            _export_resnet(sd, f"decoder.up_blocks.{rev}.resnets.{j}.",
                           dec[f"up_{rev}_resnet_{j}"])
        if rev < n - 1:
            _conv(sd, f"decoder.up_blocks.{rev}.upsamplers.0.conv",
                  dec[f"up_{rev}_upsample"]["conv"])
    _norm(sd, "decoder.conv_norm_out", dec["conv_norm_out"])
    _conv(sd, "decoder.conv_out", dec["conv_out"])

    _conv(sd, "quant_conv", p["quant_conv"])
    _conv(sd, "post_quant_conv", p["post_quant_conv"])
    return sd


def export_resampler_sd(params: Dict, depth: int) -> Dict[str, np.ndarray]:
    p = params["params"]
    sd: Dict[str, np.ndarray] = {
        "latents": _a(p["latents"])[None],          # reference stores [1, Q, D]
        "dummy_tokens": _a(p["dummy_tokens"]),
    }
    _lin(sd, "proj_in", p["proj_in"])
    _lin(sd, "proj_in_magi", p["proj_in_magi"])
    _lin(sd, "proj_out", p["proj_out"])
    _norm(sd, "norm_out", p["norm_out"])
    for i in range(depth):
        a, f = f"layers.{i}.0.", f"layers.{i}.1."
        attn, ff = p[f"layers_{i}_attn"], p[f"layers_{i}_ff"]
        _norm(sd, a + "norm1", attn["norm1"])
        _norm(sd, a + "norm2", attn["norm2"])
        _lin(sd, a + "to_q", attn["to_q"])
        _lin(sd, a + "to_kv", attn["to_kv"])
        _lin(sd, a + "to_out", attn["to_out"])
        _norm(sd, f + "0", ff["norm"])
        _lin(sd, f + "1", ff["fc1"])
        _lin(sd, f + "3", ff["fc2"])
    return sd


def export_llama_sd(params: Dict, num_layers: int,
                    prefix: str = "model.") -> Dict[str, np.ndarray]:
    """``models.mllm.llama.LlamaForCausalLM`` params → HF LLaMA state dict
    (the naming the reference's xformers fork keeps and ``port_llama``
    consumes); LoRA adapters export as ``lora_A/lora_B`` pairs."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {
        f"{prefix}embed_tokens.weight": _a(p["embed_tokens"]["embedding"]),
        f"{prefix}norm.weight": _a(p["norm"]["weight"]),
        "lm_head.weight": _a(p["lm_head"]["kernel"]).T,
    }
    for i in range(num_layers):
        lp = p[f"layers_{i}"]
        base = f"{prefix}layers.{i}."
        for ours, theirs in (("attn/q_proj", "self_attn.q_proj"),
                             ("attn/k_proj", "self_attn.k_proj"),
                             ("attn/v_proj", "self_attn.v_proj"),
                             ("attn/o_proj", "self_attn.o_proj"),
                             ("mlp/gate_proj", "mlp.gate_proj"),
                             ("mlp/up_proj", "mlp.up_proj"),
                             ("mlp/down_proj", "mlp.down_proj")):
            a, b = ours.split("/")
            node = lp[a][b]
            sd[base + theirs + ".weight"] = _a(node["base"]["kernel"]).T
            if "lora_a" in node:
                sd[base + theirs + ".lora_A.weight"] = _a(node["lora_a"]).T
                sd[base + theirs + ".lora_B.weight"] = _a(node["lora_b"]).T
        sd[base + "input_layernorm.weight"] = _a(lp["input_norm"]["weight"])
        sd[base + "post_attention_layernorm.weight"] = \
            _a(lp["post_norm"]["weight"])
    return sd


def export_qwen_resampler_sd(params: Dict) -> Dict[str, np.ndarray]:
    """``models.mllm.qwen_resampler`` params → reference ``QwenResampler``
    state dict (packed ``attn.in_proj_weight`` [3E, E])."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {"query": _a(p["query"])}
    if "kv_proj" in p:
        sd["kv_proj.weight"] = _a(p["kv_proj"]["kernel"]).T
    _norm(sd, "ln_q", p["ln_q"])
    _norm(sd, "ln_kv", p["ln_kv"])
    sd["attn.in_proj_weight"] = np.concatenate(
        [_a(p[n]["kernel"]).T for n in ("q_in_proj", "k_in_proj",
                                        "v_in_proj")], axis=0)
    sd["attn.in_proj_bias"] = np.concatenate(
        [_a(p[n]["bias"]) for n in ("q_in_proj", "k_in_proj", "v_in_proj")])
    _lin(sd, "attn.out_proj", p["out_proj"])
    return sd


def export_agent_ckpt(llm_params: Dict, input_resampler_params: Dict,
                      output_resampler_params: Dict,
                      num_layers: int) -> Dict[str, np.ndarray]:
    """ContinuousLVLM checkpoint with ``llm. / input_resampler. /
    output_resampler.`` prefixes (the reference's ``mllm/agent/
    pytorch_model.bin`` layout, ``load_ckpt_mllm`` utils.py:68-72)."""
    sd: Dict[str, np.ndarray] = {}
    for key, value in export_llama_sd(llm_params, num_layers).items():
        sd["llm." + key] = value
    for key, value in export_qwen_resampler_sd(
            input_resampler_params).items():
        sd["input_resampler." + key] = value
    for key, value in export_qwen_resampler_sd(
            output_resampler_params).items():
        sd["output_resampler." + key] = value
    return sd


def export_ip_adapter_sd(unet_params: Dict, resampler_params: Dict,
                         cfg, resampler_depth: int) -> Dict[str, Any]:
    """The ``{"image_proj", "ip_adapter"}`` checkpoint split the reference's
    ``load_ip_adapter`` consumes (``src/models/utils.py:27-51``)."""
    p = unet_params["params"]
    ip: Dict[str, np.ndarray] = {}
    for idx, (mod, k) in enumerate(attn_processor_slots(cfg)):
        if mod is None:
            continue
        attn = p[mod][f"blocks_{k}"]["attn2"]
        ip[f"{idx}.to_k_ip.weight"] = _a(attn["to_k_ip"]["kernel"]).T
        ip[f"{idx}.to_v_ip.weight"] = _a(attn["to_v_ip"]["kernel"]).T
    return {"image_proj": export_resampler_sd(resampler_params,
                                              resampler_depth),
            "ip_adapter": ip}
