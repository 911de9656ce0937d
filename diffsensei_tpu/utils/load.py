"""Checkpoint → PipelineModules wiring: the released-artifact serving path.

Mirrors what the reference demo does at load time
(``scripts/demo/gradio.py:229-283``): full manga UNet from
``pytorch_model.bin``, HF encoder dirs, the Resampler from
``image_proj_model/pytorch_model.bin`` — plus the auxiliary dict formats the
reference loaders consume (``src/models/utils.py:22-72``): stage-2 training
dicts ``{"image_proj", "unet_trained"}`` and IP-Adapter splits
``{"image_proj", "ip_adapter"}``.

``apply_ported_weights(modules, weights_cfg)`` takes a name→path mapping:

  unet / vae / text_encoder / text_encoder_2 / image_encoder / magi_encoder /
  resampler            — single-component state-dict files;
  diffsensei_ckpt      — {"image_proj", "unet_trained"} training dict;
  ip_adapter           — {"image_proj", "ip_adapter"} split (safetensors flat
                         with prefixes, or torch dict);
  ckpt_path            — released artifact directory: reads
                         image_generator/unet/pytorch_model.bin and
                         image_generator/image_proj_model/pytorch_model.bin.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from diffsensei_tpu.utils import port_torch


def _load(path: str) -> Dict[str, Any]:
    return port_torch.load_torch_file(path)


def _split_prefixed(sd: Dict[str, Any], groups) -> Dict[str, Dict[str, Any]]:
    """Flat safetensors with ``image_proj.`` / ``ip_adapter.`` prefixes →
    nested dict (reference ``load_ip_adapter`` safetensors branch)."""
    out: Dict[str, Dict[str, Any]] = {g: {} for g in groups}
    for key, value in sd.items():
        for g in groups:
            if key.startswith(g + "."):
                out[g][key[len(g) + 1:]] = value
    return out


def apply_ported_weights(modules, weights_cfg: Dict[str, str]):
    """Overlay torch-layout checkpoint files onto ``PipelineModules`` params.

    Unknown keys raise (silent typos would serve random weights)."""
    known = {"unet", "vae", "text_encoder", "text_encoder_2", "image_encoder",
             "magi_encoder", "resampler", "image_proj", "diffsensei_ckpt",
             "ip_adapter", "ckpt_path"}
    unknown = set(weights_cfg) - known
    if unknown:
        raise ValueError(f"unknown weights keys {sorted(unknown)}; "
                         f"expected from {sorted(known)}")

    if "ckpt_path" in weights_cfg:
        root = weights_cfg["ckpt_path"]
        gen = os.path.join(root, "image_generator")
        # released-artifact subpaths (gradio.py:229-283 + HF/diffusers
        # from_pretrained file conventions inside the pipeline dir)
        subpaths = {
            "unet": ("unet/pytorch_model.bin",
                     "unet/diffusion_pytorch_model.safetensors"),
            "resampler": ("image_proj_model/pytorch_model.bin",),
            "vae": ("vae/diffusion_pytorch_model.safetensors",
                    "vae/diffusion_pytorch_model.bin"),
            "text_encoder": ("text_encoder/model.safetensors",
                             "text_encoder/pytorch_model.bin"),
            "text_encoder_2": ("text_encoder_2/model.safetensors",
                               "text_encoder_2/pytorch_model.bin"),
            "image_encoder": ("clip_image_encoder/model.safetensors",
                              "clip_image_encoder/pytorch_model.bin"),
            "magi_encoder": ("magi_image_encoder/model.safetensors",
                             "magi_image_encoder/pytorch_model.bin"),
        }
        weights_cfg = {k: v for k, v in weights_cfg.items()
                       if k != "ckpt_path"}
        for name, candidates in subpaths.items():
            for rel in candidates:
                path = os.path.join(gen, *rel.split("/"))
                if os.path.exists(path):
                    weights_cfg.setdefault(name, path)
                    break

    if "unet" in weights_cfg:
        sd = _load(weights_cfg["unet"])
        modules.unet_params, missing_ip = port_torch.port_sdxl_unet(
            sd, modules.unet.config)
        if missing_ip:
            print(f"# unet: {len(missing_ip)} IP projections seeded from "
                  "frozen to_k/to_v (plain-SDXL checkpoint)")
    if "vae" in weights_cfg:
        sd = _load(weights_cfg["vae"])
        modules.vae_params = port_torch.port_vae(sd, modules.vae.config)
    if "text_encoder" in weights_cfg:
        sd = _load(weights_cfg["text_encoder"])
        modules.text_encoder_params = port_torch.port_clip_text(
            sd, modules.text_encoder.config.num_layers)
    if "text_encoder_2" in weights_cfg:
        sd = _load(weights_cfg["text_encoder_2"])
        modules.text_encoder_2_params = port_torch.port_clip_text(
            sd, modules.text_encoder_2.config.num_layers)
    if "image_encoder" in weights_cfg:
        sd = _load(weights_cfg["image_encoder"])
        modules.image_encoder_params = port_torch.port_clip_vision(
            sd, modules.image_encoder.config.num_layers)
    if "magi_encoder" in weights_cfg:
        sd = _load(weights_cfg["magi_encoder"])
        modules.magi_encoder_params = port_torch.port_vitmae(
            sd, modules.magi_encoder.config.num_layers)
    for key in ("resampler", "image_proj"):
        if key in weights_cfg:
            sd = _load(weights_cfg[key])
            modules.resampler_params = port_torch.port_resampler(
                port_torch.strip_module_prefix(sd),
                modules.resampler.config.depth)

    if (("diffsensei_ckpt" in weights_cfg or "ip_adapter" in weights_cfg)
            and modules.unet_params is None):
        # overlay modes need an existing UNet tree (init="none" fast path)
        modules.fill_missing_params()

    if "diffsensei_ckpt" in weights_cfg:
        ckpt = _load(weights_cfg["diffsensei_ckpt"])
        res_params, unet_params = port_torch.port_diffsensei_ckpt(
            ckpt, modules.unet_params, modules.resampler.config.depth,
            modules.unet.config)
        modules.resampler_params = res_params
        modules.unet_params = unet_params

    if "ip_adapter" in weights_cfg:
        sd = _load(weights_cfg["ip_adapter"])
        if "ip_adapter" not in sd:     # flat safetensors with prefixes
            sd = _split_prefixed(sd, ("image_proj", "ip_adapter"))
        modules.resampler_params = port_torch.port_resampler(
            port_torch.strip_module_prefix(sd["image_proj"]),
            modules.resampler.config.depth)
        modules.unet_params = port_torch.port_ip_adapter(
            port_torch.strip_module_prefix(sd["ip_adapter"]),
            modules.unet_params, modules.unet.config)
    return modules


def load_agent_weights(agent, path: str):
    """Load a ContinuousLVLM checkpoint (``mllm/agent/pytorch_model.bin``
    layout: ``llm. / input_resampler. / output_resampler.`` prefixes,
    reference ``load_ckpt_mllm`` utils.py:68-72; ``module.`` prefixes and
    peft-LoRA naming handled) into a built agent, returning it with params
    replaced."""
    import dataclasses

    groups = port_torch.split_agent_ckpt(_load(path))
    updates = {}
    if groups["llm"]:
        updates["llm_params"] = port_torch.port_llama(
            groups["llm"], agent.config.llm.num_layers)
    if groups["input_resampler"]:
        updates["input_resampler_params"] = port_torch.port_qwen_resampler(
            groups["input_resampler"])
    if groups["output_resampler"]:
        updates["output_resampler_params"] = port_torch.port_qwen_resampler(
            groups["output_resampler"])
    return dataclasses.replace(agent, **updates)


def load_weights_any(modules, source: str):
    """Dispatch a ``--weights`` argument to the right loader:

    * YAML file → name→path mapping for :func:`apply_ported_weights`;
    * released-artifact directory (contains ``image_generator/``) →
      ``ckpt_path`` mode;
    * Orbax weights dir (``train.checkpoint.export_weights`` of
      ``{"unet": ..., "resampler": ...}``) → restored over the current params.
    """
    if os.path.isfile(source) and source.endswith((".yaml", ".yml")):
        import yaml
        with open(source) as f:
            cfg = yaml.safe_load(f) or {}
        base = os.path.dirname(os.path.abspath(source))
        cfg = {k: v if os.path.isabs(str(v)) else os.path.join(base, str(v))
               for k, v in cfg.items()}
        return apply_ported_weights(modules, cfg)
    if os.path.isdir(os.path.join(source, "image_generator")):
        return apply_ported_weights(modules, {"ckpt_path": source})
    if os.path.isdir(source):
        import jax

        from diffsensei_tpu.train.checkpoint import load_weights
        if modules.unet_params is None or modules.resampler_params is None:
            # Orbax needs a structure template; materialize zero trees for
            # the init="none" serving fast path (serve/cli.py) before restore
            modules.fill_missing_params()
        template = {"unet": modules.unet_params,
                    "resampler": modules.resampler_params}
        template = {k: v for k, v in template.items() if v is not None}
        restored = load_weights(
            source, jax.tree.map(lambda x: x, template))
        if "unet" in restored:
            modules.unet_params = restored["unet"]
        if "resampler" in restored:
            modules.resampler_params = restored["resampler"]
        return modules
    raise ValueError(f"unrecognized weights source: {source}")
