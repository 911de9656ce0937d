"""Port PyTorch checkpoints (diffusers / transformers / DiffSensei) → JAX pytrees.

The reference serves released weights as ``from_pretrained`` directories plus
``pytorch_model.bin`` / safetensors blobs (``scripts/demo/gradio.py:229-270``,
``src/models/utils.py:22-72``). This module maps those state dicts onto the
flax param trees of ``diffsensei_tpu.models``:

* ``port_clip_text``   — HF ``CLIPTextModel(WithProjection)`` → ``CLIPTextEncoder``
* ``port_clip_vision`` — HF ``CLIPVisionModel`` → ``VisionTransformer``
* ``port_vitmae``      — HF ``ViTMAEModel`` (Magi crop encoder) → ``VisionTransformer``
* ``port_sdxl_unet``   — diffusers ``UNet2DConditionModel`` → ``UNetMangaModel``
* ``port_vae``         — diffusers ``AutoencoderKL`` → ``AutoencoderKL``
* ``port_resampler``   — reference ``Resampler`` state dict → ``Resampler``
* ``port_ip_adapter``  — the ``{"image_proj", "ip_adapter"}`` checkpoint split
  (``src/models/utils.py:27-51``): ``ip_adapter`` carries per-processor
  ``to_k_ip/to_v_ip`` weights keyed by attn-processor index
* ``port_diffsensei_ckpt`` — the stage-2 ``{"image_proj", "unet_trained"}``
  training dict (``scripts/train/train.py:451-452``)

Conventions: torch Linear ``[out, in]`` → flax kernel ``[in, out]``; torch conv
OIHW → flax HWIO; Group/LayerNorm weight/bias → scale/bias. ``strict=False``
semantics mirror the reference loaders (missing keys keep their current values;
unknown torch keys are returned for inspection).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def linear(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _set(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------
def port_clip_text(sd: Dict[str, Any], num_layers: int,
                   prefix: str = "text_model.") -> Dict:
    p: Dict = {}
    _set(p, "token_embedding/embedding",
         _np(sd[f"{prefix}embeddings.token_embedding.weight"]))
    p["position_embedding"] = _np(
        sd[f"{prefix}embeddings.position_embedding.weight"])
    for i in range(num_layers):
        base = f"{prefix}encoder.layers.{i}."
        for ours, theirs in (("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("out_proj", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            _set(p, f"layers_{i}/{ours}", linear(sd, base + theirs))
        _set(p, f"layers_{i}/layer_norm1", norm(sd, base + "layer_norm1"))
        _set(p, f"layers_{i}/layer_norm2", norm(sd, base + "layer_norm2"))
    _set(p, "final_layer_norm", norm(sd, f"{prefix}final_layer_norm"))
    if "text_projection.weight" in sd:
        _set(p, "text_projection",
             {"kernel": _np(sd["text_projection.weight"]).T})
    return {"params": p}


# ---------------------------------------------------------------------------
# Vision encoders
# ---------------------------------------------------------------------------
def port_clip_vision(sd: Dict[str, Any], num_layers: int,
                     prefix: str = "vision_model.") -> Dict:
    p: Dict = {}
    _set(p, "patch_embedding",
         conv(sd, f"{prefix}embeddings.patch_embedding"))
    p["class_embedding"] = _np(sd[f"{prefix}embeddings.class_embedding"])
    p["position_embedding"] = _np(
        sd[f"{prefix}embeddings.position_embedding.weight"])
    # HF attribute is literally "pre_layrnorm" (typo preserved upstream)
    _set(p, "pre_layernorm", norm(sd, f"{prefix}pre_layrnorm"))
    for i in range(num_layers):
        base = f"{prefix}encoder.layers.{i}."
        for ours, theirs in (("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("out_proj", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            _set(p, f"layers_{i}/{ours}", linear(sd, base + theirs))
        _set(p, f"layers_{i}/layer_norm1", norm(sd, base + "layer_norm1"))
        _set(p, f"layers_{i}/layer_norm2", norm(sd, base + "layer_norm2"))
    _set(p, "post_layernorm", norm(sd, f"{prefix}post_layernorm"))
    return {"params": p}


def port_vitmae(sd: Dict[str, Any], num_layers: int,
                prefix: str = "") -> Dict:
    """HF ViTMAEModel (Magi crop encoder; masking disabled at inference)."""
    p: Dict = {}
    _set(p, "patch_embedding",
         conv(sd, f"{prefix}embeddings.patch_embeddings.projection"))
    p["class_embedding"] = _np(sd[f"{prefix}embeddings.cls_token"]).reshape(-1)
    p["position_embedding"] = _np(
        sd[f"{prefix}embeddings.position_embeddings"])[0]
    for i in range(num_layers):
        base = f"{prefix}encoder.layer.{i}."
        for ours, theirs in (
                ("q_proj", "attention.attention.query"),
                ("k_proj", "attention.attention.key"),
                ("v_proj", "attention.attention.value"),
                ("out_proj", "attention.output.dense"),
                ("fc1", "intermediate.dense"), ("fc2", "output.dense")):
            _set(p, f"layers_{i}/{ours}", linear(sd, base + theirs))
        _set(p, f"layers_{i}/layer_norm1", norm(sd, base + "layernorm_before"))
        _set(p, f"layers_{i}/layer_norm2", norm(sd, base + "layernorm_after"))
    _set(p, "post_layernorm", norm(sd, f"{prefix}layernorm"))
    return {"params": p}


# ---------------------------------------------------------------------------
# Resampler (reference src/models/resampler.py state dict)
# ---------------------------------------------------------------------------
def port_resampler(sd: Dict[str, Any], depth: int) -> Dict:
    p: Dict = {}
    p["latents"] = _np(sd["latents"]).reshape(
        _np(sd["latents"]).shape[-2:])
    p["dummy_tokens"] = _np(sd["dummy_tokens"]).reshape(
        _np(sd["dummy_tokens"]).shape[-2:])
    _set(p, "proj_in", linear(sd, "proj_in"))
    _set(p, "proj_in_magi", linear(sd, "proj_in_magi"))
    _set(p, "proj_out", linear(sd, "proj_out"))
    _set(p, "norm_out", norm(sd, "norm_out"))
    for i in range(depth):
        # reference layers: ModuleList of [PerceiverAttention, FeedForward]
        a = f"layers.{i}.0."
        f = f"layers.{i}.1."
        _set(p, f"layers_{i}_attn/norm1", norm(sd, a + "norm1"))
        _set(p, f"layers_{i}_attn/norm2", norm(sd, a + "norm2"))
        _set(p, f"layers_{i}_attn/to_q", linear(sd, a + "to_q"))
        _set(p, f"layers_{i}_attn/to_kv", linear(sd, a + "to_kv"))
        _set(p, f"layers_{i}_attn/to_out", linear(sd, a + "to_out"))
        # FeedForward: LayerNorm + Linear + GELU + Linear (resampler.py:11-29)
        _set(p, f"layers_{i}_ff/norm", norm(sd, f + "0"))
        _set(p, f"layers_{i}_ff/fc1", linear(sd, f + "1"))
        _set(p, f"layers_{i}_ff/fc2", linear(sd, f + "3"))
    return {"params": p}


def port_image_proj(sd: Dict[str, Any]) -> Dict:
    """Reference ``ImageProj{,Dummy}Model`` state dict (``src/models/projection.py``)
    → ``models.projection`` params. Magi branch / dummy tokens are optional."""
    p: Dict = {"proj": linear(sd, "proj"), "norm": norm(sd, "norm")}
    if "proj_magi.weight" in sd:
        p["proj_magi"] = linear(sd, "proj_magi")
    if "dummy_tokens" in sd:
        p["dummy_tokens"] = _np(sd["dummy_tokens"])
    return {"params": p}


# ---------------------------------------------------------------------------
# SDXL UNet (diffusers UNet2DConditionModel naming)
# ---------------------------------------------------------------------------
def _port_resnet(sd, base) -> Dict:
    out = {
        "norm1": norm(sd, base + "norm1"),
        "conv1": conv(sd, base + "conv1"),
        "norm2": norm(sd, base + "norm2"),
        "conv2": conv(sd, base + "conv2"),
    }
    if base + "time_emb_proj.weight" in sd:
        out["time_emb_proj"] = linear(sd, base + "time_emb_proj")
    if base + "conv_shortcut.weight" in sd:
        out["conv_shortcut"] = conv(sd, base + "conv_shortcut")
    return out


def _port_transformer(sd, base, num_layers) -> Dict:
    out = {
        "norm": norm(sd, base + "norm"),
        "proj_in": linear(sd, base + "proj_in"),
        "proj_out": linear(sd, base + "proj_out"),
    }
    for k in range(num_layers):
        tb = f"{base}transformer_blocks.{k}."
        blk = {
            "norm1": norm(sd, tb + "norm1"),
            "norm2": norm(sd, tb + "norm2"),
            "norm3": norm(sd, tb + "norm3"),
            "attn1": {
                "to_q": linear(sd, tb + "attn1.to_q"),
                "to_k": linear(sd, tb + "attn1.to_k"),
                "to_v": linear(sd, tb + "attn1.to_v"),
                "to_out": linear(sd, tb + "attn1.to_out.0"),
            },
            "attn2": {
                "to_q": linear(sd, tb + "attn2.to_q"),
                "to_k": linear(sd, tb + "attn2.to_k"),
                "to_v": linear(sd, tb + "attn2.to_v"),
                "to_out": linear(sd, tb + "attn2.to_out.0"),
            },
            "ff": {
                "proj_in": linear(sd, tb + "ff.net.0.proj"),
                "proj_out": linear(sd, tb + "ff.net.2"),
            },
        }
        # masked-IP projections (DiffSensei checkpoints carry them inside the
        # processor; merged UNet exports carry them as attn2.to_{k,v}_ip)
        if tb + "attn2.to_k_ip.weight" in sd:
            blk["attn2"]["to_k_ip"] = linear(sd, tb + "attn2.to_k_ip")
            blk["attn2"]["to_v_ip"] = linear(sd, tb + "attn2.to_v_ip")
        out[f"blocks_{k}"] = blk
    return out


def port_sdxl_unet(sd: Dict[str, Any], cfg) -> Tuple[Dict, List[str]]:
    """Returns (params, missing_ip_names): IP projections absent from a plain
    SDXL checkpoint are listed so the caller can seed them from to_k/to_v
    (the reference init, ``src/models/unet.py:72-82``).

    Accepts both merged ``attn2.to_{k,v}_ip`` names and the released full-UNet
    ``pytorch_model.bin`` layout where processor params sit under
    ``attn2.processor.to_{k,v}_ip`` (torch stores ``set_attn_processor``-ed
    module params under the attention's ``processor.`` prefix)."""
    sd = {k.replace(".processor.", "."): v for k, v in sd.items()}
    p: Dict = {}
    missing_ip: List[str] = []
    tl = cfg.transformer_layers_per_block
    n_levels = len(cfg.block_out_channels)

    _set(p, "conv_in", conv(sd, "conv_in"))
    _set(p, "time_embedding/linear_1", linear(sd, "time_embedding.linear_1"))
    _set(p, "time_embedding/linear_2", linear(sd, "time_embedding.linear_2"))
    _set(p, "add_embedding/linear_1", linear(sd, "add_embedding.linear_1"))
    _set(p, "add_embedding/linear_2", linear(sd, "add_embedding.linear_2"))

    for level in range(n_levels):
        for j in range(cfg.layers_per_block):
            p[f"down_{level}_resnet_{j}"] = _port_resnet(
                sd, f"down_blocks.{level}.resnets.{j}.")
            if tl[level] > 0:
                p[f"down_{level}_attn_{j}"] = _port_transformer(
                    sd, f"down_blocks.{level}.attentions.{j}.", tl[level])
        if level < n_levels - 1:
            _set(p, f"down_{level}_downsample/conv",
                 conv(sd, f"down_blocks.{level}.downsamplers.0.conv"))

    p["mid_resnet_0"] = _port_resnet(sd, "mid_block.resnets.0.")
    p["mid_resnet_1"] = _port_resnet(sd, "mid_block.resnets.1.")
    p["mid_attn"] = _port_transformer(sd, "mid_block.attentions.0.",
                                      cfg.mid_transformer_layers)

    for rev, level in enumerate(reversed(range(n_levels))):
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{rev}_resnet_{j}"] = _port_resnet(
                sd, f"up_blocks.{rev}.resnets.{j}.")
            if tl[level] > 0:
                p[f"up_{rev}_attn_{j}"] = _port_transformer(
                    sd, f"up_blocks.{rev}.attentions.{j}.", tl[level])
        if level > 0:
            _set(p, f"up_{rev}_upsample/conv",
                 conv(sd, f"up_blocks.{rev}.upsamplers.0.conv"))

    _set(p, "conv_norm_out", norm(sd, "conv_norm_out"))
    _set(p, "conv_out", conv(sd, "conv_out"))

    if cfg.use_dialog_embedding:
        if "dialog_bbox_embedding" in sd:
            p["dialog_bbox_embedding"] = _np(sd["dialog_bbox_embedding"])
        else:
            p["dialog_bbox_embedding"] = np.zeros(
                (cfg.block_out_channels[0],), np.float32)

    # seed missing IP projections from the frozen to_k/to_v (unet.py:72-82)
    def seed_ip(node):
        for key, val in list(node.items()):
            if isinstance(val, dict):
                if "to_k" in val and "to_k_ip" not in val and "to_q" in val \
                        and key == "attn2":
                    val["to_k_ip"] = {"kernel": val["to_k"]["kernel"].copy()}
                    val["to_v_ip"] = {"kernel": val["to_v"]["kernel"].copy()}
                    missing_ip.append(key)
                else:
                    seed_ip(val)
    seed_ip(p)
    return {"params": p}, missing_ip


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL naming)
# ---------------------------------------------------------------------------
def _port_vae_attn(sd, base) -> Dict:
    return {
        "group_norm": norm(sd, base + "group_norm"),
        "to_q": linear(sd, base + "to_q"),
        "to_k": linear(sd, base + "to_k"),
        "to_v": linear(sd, base + "to_v"),
        "to_out": linear(sd, base + "to_out.0"),
    }


def port_vae(sd: Dict[str, Any], cfg) -> Dict:
    p: Dict = {"encoder": {}, "decoder": {}}
    enc, dec = p["encoder"], p["decoder"]
    n = len(cfg.block_out_channels)

    _set(enc, "conv_in", conv(sd, "encoder.conv_in"))
    for level in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{level}_resnet_{j}"] = _port_resnet(
                sd, f"encoder.down_blocks.{level}.resnets.{j}.")
        if level < n - 1:
            _set(enc, f"down_{level}_downsample/conv",
                 conv(sd, f"encoder.down_blocks.{level}.downsamplers.0.conv"))
    enc["mid_resnet_0"] = _port_resnet(sd, "encoder.mid_block.resnets.0.")
    enc["mid_resnet_1"] = _port_resnet(sd, "encoder.mid_block.resnets.1.")
    enc["mid_attn"] = _port_vae_attn(sd, "encoder.mid_block.attentions.0.")
    _set(enc, "conv_norm_out", norm(sd, "encoder.conv_norm_out"))
    _set(enc, "conv_out", conv(sd, "encoder.conv_out"))

    _set(dec, "conv_in", conv(sd, "decoder.conv_in"))
    dec["mid_resnet_0"] = _port_resnet(sd, "decoder.mid_block.resnets.0.")
    dec["mid_resnet_1"] = _port_resnet(sd, "decoder.mid_block.resnets.1.")
    dec["mid_attn"] = _port_vae_attn(sd, "decoder.mid_block.attentions.0.")
    for rev in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{rev}_resnet_{j}"] = _port_resnet(
                sd, f"decoder.up_blocks.{rev}.resnets.{j}.")
        if rev < n - 1:
            _set(dec, f"up_{rev}_upsample/conv",
                 conv(sd, f"decoder.up_blocks.{rev}.upsamplers.0.conv"))
    _set(dec, "conv_norm_out", norm(sd, "decoder.conv_norm_out"))
    _set(dec, "conv_out", conv(sd, "decoder.conv_out"))

    _set(p, "quant_conv", conv(sd, "quant_conv"))
    _set(p, "post_quant_conv", conv(sd, "post_quant_conv"))
    return {"params": p}


# ---------------------------------------------------------------------------
# LLaMA (HF / SEED-X; the reference's xformers fork keeps HF naming)
# ---------------------------------------------------------------------------
def _strip_peft(name: str) -> str:
    """peft-wrapped names → plain HF names; LoRA leaves keep a marker."""
    name = name.replace("base_model.model.", "")
    name = name.replace(".base_layer.", ".")
    return name


def port_llama(sd: Dict[str, Any], num_layers: int,
               prefix: str = "model.") -> Dict:
    """HF ``LlamaForCausalLM`` (optionally peft-LoRA-wrapped, the reference's
    stage-3 export) → ``models.mllm.llama.LlamaForCausalLM`` params.

    LoRA adapters (``lora_A/lora_B``) map onto the native ``LoRADense``
    ``lora_a/lora_b`` params when present.
    """
    sd = {_strip_peft(k): v for k, v in sd.items()}
    p: Dict = {}
    _set(p, "embed_tokens/embedding", _np(sd[f"{prefix}embed_tokens.weight"]))
    for i in range(num_layers):
        base = f"{prefix}layers.{i}."
        for ours, theirs in (("attn/q_proj", "self_attn.q_proj"),
                             ("attn/k_proj", "self_attn.k_proj"),
                             ("attn/v_proj", "self_attn.v_proj"),
                             ("attn/o_proj", "self_attn.o_proj"),
                             ("mlp/gate_proj", "mlp.gate_proj"),
                             ("mlp/up_proj", "mlp.up_proj"),
                             ("mlp/down_proj", "mlp.down_proj")):
            _set(p, f"layers_{i}/{ours}/base", linear(sd, base + theirs))
            la = f"{base}{theirs}.lora_A.default.weight"
            if la not in sd:
                la = f"{base}{theirs}.lora_A.weight"
            if la in sd:
                lb = la.replace("lora_A", "lora_B")
                _set(p, f"layers_{i}/{ours}", {
                    **p_get(p, f"layers_{i}/{ours}"),
                    "lora_a": _np(sd[la]).T,
                    "lora_b": _np(sd[lb]).T,
                })
        _set(p, f"layers_{i}/input_norm/weight",
             _np(sd[base + "input_layernorm.weight"]))
        _set(p, f"layers_{i}/post_norm/weight",
             _np(sd[base + "post_attention_layernorm.weight"]))
    _set(p, "norm/weight", _np(sd[f"{prefix}norm.weight"]))
    _set(p, "lm_head", {"kernel": _np(sd["lm_head.weight"]).T})
    return {"params": p}


def p_get(tree: Dict, path: str) -> Dict:
    node = tree
    for k in path.split("/"):
        node = node.setdefault(k, {})
    return node


def split_agent_ckpt(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a ContinuousLVLM checkpoint (``load_ckpt_mllm``, reference
    ``src/models/utils.py:68-72``; keys prefixed ``llm.`` /
    ``input_resampler.`` / ``output_resampler.``) into per-component state
    dicts for ``port_llama`` / ``port_qwen_resampler``."""
    sd = strip_module_prefix(sd)
    groups: Dict[str, Dict[str, Any]] = {
        "llm": {}, "input_resampler": {}, "output_resampler": {}}
    for key, value in sd.items():
        for g in groups:
            prefix = g + "."
            if key.startswith(prefix):
                groups[g][key[len(prefix):]] = value
                break
    return groups


def port_qwen_resampler(sd: Dict[str, Any]) -> Dict:
    """Reference ``QwenResampler`` state dict (torch ``nn.MultiheadAttention``
    with packed ``in_proj_weight`` [3E, E]) → ``models.mllm.qwen_resampler``.
    The fixed sin-cos ``pos_embed`` is recomputed, not loaded."""
    p: Dict = {}
    p["query"] = _np(sd["query"])
    if "kv_proj.weight" in sd:
        _set(p, "kv_proj", {"kernel": _np(sd["kv_proj.weight"]).T})
    _set(p, "ln_q", norm(sd, "ln_q"))
    _set(p, "ln_kv", norm(sd, "ln_kv"))
    w = _np(sd["attn.in_proj_weight"])          # [3E, E]
    bias = _np(sd["attn.in_proj_bias"])         # [3E]
    e = w.shape[1]
    for i, name in enumerate(("q_in_proj", "k_in_proj", "v_in_proj")):
        _set(p, name, {"kernel": w[i * e:(i + 1) * e].T,
                       "bias": bias[i * e:(i + 1) * e]})
    _set(p, "out_proj", linear(sd, "attn.out_proj"))
    return {"params": p}


# ---------------------------------------------------------------------------
# DiffSensei checkpoint dicts
# ---------------------------------------------------------------------------
def port_qwen_visual(sd: Dict[str, Any], num_layers: int, num_heads: int,
                     with_pool: bool = False) -> Dict:
    """Reference Qwen-VL ViT (``src/models/vision_encoders/qwen_visual.py:
    321,423``) → ``models.mllm.qwen_visual`` params.

    The reference ``VisualAttention`` packs qkv in ONE ``in_proj`` whose rows
    interleave PER HEAD — ``mixed.view(sq, b, heads, 3*hn).split(hn, -1)``
    (``qwen_visual.py:190-199``) means head h's rows are ``[q_h; k_h; v_h]``,
    NOT the usual ``[Q; K; V]`` thirds. De-interleave accordingly.
    """
    p: Dict = {}
    p["patch_embedding"] = conv(sd, "conv1")
    p["position_embedding"] = _np(sd["positional_embedding"])
    _set(p, "ln_pre", norm(sd, "ln_pre"))
    for i in range(num_layers):
        base = f"transformer.resblocks.{i}."
        w = _np(sd[base + "attn.in_proj.weight"])        # [3E, E]
        bias = _np(sd[base + "attn.in_proj.bias"])       # [3E]
        e = w.shape[1]
        hn = e // num_heads
        w3 = w.reshape(num_heads, 3, hn, e)
        b3 = bias.reshape(num_heads, 3, hn)
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(p, f"layers_{i}/{name}", {
                "kernel": w3[:, j].reshape(e, e).T,
                "bias": b3[:, j].reshape(e),
            })
        _set(p, f"layers_{i}/out_proj", linear(sd, base + "attn.out_proj"))
        _set(p, f"layers_{i}/layer_norm1", norm(sd, base + "ln_1"))
        _set(p, f"layers_{i}/layer_norm2", norm(sd, base + "ln_2"))
        _set(p, f"layers_{i}/fc1", linear(sd, base + "mlp.c_fc"))
        _set(p, f"layers_{i}/fc2", linear(sd, base + "mlp.c_proj"))
    if with_pool:
        pool_sd = {k[len("attn_pool."):]: v for k, v in sd.items()
                   if k.startswith("attn_pool.")}
        p["attn_pool"] = port_qwen_resampler(pool_sd)["params"]
        _set(p, "ln_post", norm(sd, "ln_post"))
        # reference applies ``x @ proj`` with proj [in, out] — already the
        # flax kernel orientation, no transpose
        _set(p, "proj", {"kernel": _np(sd["proj"])})
    return {"params": p}


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DDP 'module.' prefix strip (reference ``load_ckpt``, utils.py:53-66)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def attn_processor_slots(cfg) -> List[Tuple[Optional[str], int]]:
    """Enumerate the UNet's attention-processor ModuleList positions.

    The reference loads ``ip_adapter`` checkpoints with
    ``nn.ModuleList(unet.attn_processors.values()).load_state_dict(sd)``
    (``src/models/utils.py:46-48``), so key ``{i}.to_k_ip.weight`` indexes the
    i-th processor in diffusers ``attn_processors`` order. That order is
    ``named_children`` insertion order — **down_blocks, up_blocks, mid_block**
    (both ModuleLists are assigned before ``mid_block`` in
    ``UNet2DConditionModel.__init__``) — and within each transformer block the
    parameterless attn1 ``AttnProcessor2_0`` (a ``torch.nn.Module``,
    reference ``attention_processor.py:7``) consumes an index before attn2.

    Returns ``[(module_name_or_None, block_idx)]`` aligned with the checkpoint
    indices; entries with ``module_name=None`` are attn1 slots (no weights).
    """
    slots: List[Tuple[Optional[str], int]] = []
    tl = cfg.transformer_layers_per_block
    n_levels = len(cfg.block_out_channels)

    def add(mod: str, n_blocks: int) -> None:
        for k in range(n_blocks):
            slots.append((None, k))    # attn1: parameterless processor
            slots.append((mod, k))     # attn2: holds to_k_ip / to_v_ip

    for level in range(n_levels):
        if tl[level] == 0:
            continue
        for j in range(cfg.layers_per_block):
            add(f"down_{level}_attn_{j}", tl[level])
    for rev, level in enumerate(reversed(range(n_levels))):
        if tl[level] == 0:
            continue
        for j in range(cfg.layers_per_block + 1):
            add(f"up_{rev}_attn_{j}", tl[level])
    add("mid_attn", cfg.mid_transformer_layers)
    return slots


def port_ip_adapter(ip_sd: Dict[str, Any], unet_params: Dict,
                    cfg) -> Dict:
    """Apply an ``ip_adapter`` group (``{idx}.to_k_ip.weight`` keyed by
    attn-processor ModuleList position, ``src/models/utils.py:27-51``) onto
    ported UNet params. Raises if any checkpoint weight key maps to no slot —
    a silent skip here would assign released weights to wrong layers."""
    p = unet_params["params"]
    consumed = set()
    for idx, (mod, k) in enumerate(attn_processor_slots(cfg)):
        kw = f"{idx}.to_k_ip.weight"
        if mod is None or kw not in ip_sd:
            continue
        _write_ip_proj(p, mod, k, None,
                       _np(ip_sd[kw]).T,
                       _np(ip_sd[f"{idx}.to_v_ip.weight"]).T)
        consumed.update({kw, f"{idx}.to_v_ip.weight"})
    leftover = [k for k in ip_sd
                if k.endswith((".to_k_ip.weight", ".to_v_ip.weight"))
                and k not in consumed]
    if leftover:
        raise ValueError(
            f"ip_adapter keys matched no attn2 processor slot: {leftover[:6]}"
            f"{'...' if len(leftover) > 6 else ''} — index layout mismatch")
    return unet_params


def _write_ip_proj(p, mod, k, n_layers, k_kernel, v_kernel):
    """Write one block's to_k_ip/to_v_ip kernels."""
    del n_layers
    attn = p[mod][f"blocks_{k}"]["attn2"]
    attn["to_k_ip"] = {"kernel": k_kernel}
    attn["to_v_ip"] = {"kernel": v_kernel}


def port_diffsensei_ckpt(ckpt: Dict[str, Any], unet_params: Dict,
                         resampler_depth: int, cfg) -> Tuple[Dict, Dict]:
    """Stage-2 training dict ``{"image_proj", "unet_trained"}``
    (``train.py:451-452``) → (resampler_params, updated unet_params)."""
    res_params = port_resampler(strip_module_prefix(ckpt["image_proj"]),
                                resampler_depth)
    unet_sd = strip_module_prefix(ckpt["unet_trained"])
    merged, _ = port_sdxl_unet_partial(unet_sd, unet_params, cfg)
    return res_params, merged


def port_sdxl_unet_partial(sd: Dict[str, Any], unet_params: Dict,
                           cfg) -> Tuple[Dict, List[str]]:
    """strict=False overlay: port whatever diffusers-style keys are present in
    ``sd`` on top of existing params (reference ``load_unet``, utils.py:22-25)."""
    sd = {k.replace(".processor.", "."): v for k, v in sd.items()}
    applied: List[str] = []
    p = unet_params["params"]
    # Full dicts (contain conv_in) go through the complete porter; partial
    # stage-2 dicts only carry IP projections + the dialog embedding, whose
    # diffusers-style names translate directly:
    if "conv_in.weight" in sd:
        return port_sdxl_unet(sd, cfg)
    tl = cfg.transformer_layers_per_block
    for key, val in sd.items():
        if key == "dialog_bbox_embedding":
            p["dialog_bbox_embedding"] = _np(val)
            applied.append(key)
        elif ".to_k_ip.weight" in key or ".to_v_ip.weight" in key:
            # e.g. down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k_ip.weight
            parts = key.split(".")
            which = parts[-2]                       # to_k_ip / to_v_ip
            k = int(parts[parts.index("transformer_blocks") + 1])
            if parts[0] == "down_blocks":
                mod = f"down_{parts[1]}_attn_{parts[3]}"
                n_layers = tl[int(parts[1])]
            elif parts[0] == "mid_block":
                mod = "mid_attn"
                n_layers = cfg.mid_transformer_layers
            else:
                mod = f"up_{parts[1]}_attn_{parts[3]}"
                n_layers = tl[len(cfg.block_out_channels) - 1 - int(parts[1])]
            kern = _np(val).T
            if which == "to_k_ip":
                _write_ip_proj(p, mod, k, n_layers, kern,
                               _np(sd[key.replace("to_k_ip", "to_v_ip")]).T)
            applied.append(key)
    return unet_params, applied


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load .safetensors or torch .bin/.pth into a flat numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)
