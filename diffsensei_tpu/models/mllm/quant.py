"""Weight-only int8 quantization for the SEED-X LLM serving path.

The reference serves its 13B-class LLaMA fork in fp16 on a large-HBM GPU
(``scripts/demo/gradio.py:257-270`` loads the full model on ``cuda:0``). A
single TPU v5e has 16 GB of HBM — bf16 weights (~26 GB) cannot fit, which is
why the TP mesh path exists (``parallel/mesh.llm_param_sharding_rules``).
This module adds the single-chip alternative: per-output-channel symmetric
int8 weights (~13 GB) with fp32 scales, consumed by
``models.mllm.llama.Int8Dense``. Because autoregressive decode is
HBM-bandwidth-bound (every step streams the full weight set), halving the
weight bytes also roughly halves ms/token.

Scope: the seven projection matrices per layer (q/k/v/o/gate/up/down) and
``lm_head`` — together >99% of LLM bytes at SEED-X scale. Embeddings (a
gather, not a streamed matmul) and norms stay in the compute dtype.

All tree math runs host-side in numpy so a 13B tree can be converted from a
ported torch checkpoint without ever materializing bf16 weights on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def quantize_kernel(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: w[in, out] → (q int8, scale fp32).

    ``q * scale ≈ w`` columnwise; scale = max|w[:, j]| / 127 (zero columns get
    scale 1 to avoid 0/0).
    """
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def merge_llm_lora(params: Any, alpha: Optional[float] = None) -> Any:
    """Fold LLM LoRA adapters into their nested ``base/kernel`` weights.

    The LLM's ``LoRADense`` (``models/mllm/llama.py``) nests an ``nn.Dense``
    under ``base`` — a different tree layout from the UNet's flat
    ``models/lora.py::merge_lora_params``. Default ``alpha`` follows the
    module default (16.0). Returns a new tree with ``lora_a``/``lora_b``
    dropped, loadable by a ``lora_rank=0`` model.
    """
    def walk(node):
        if not isinstance(node, dict):
            return node
        node = dict(node)
        if ("lora_a" in node and "lora_b" in node and "base" in node
                and isinstance(node["base"], dict)
                and "kernel" in node["base"]):
            a = np.asarray(node.pop("lora_a"), np.float32)
            b = np.asarray(node.pop("lora_b"), np.float32)
            rank = a.shape[-1]
            scale = (16.0 if alpha is None else alpha) / rank
            base = dict(node["base"])
            kern = base["kernel"]
            base["kernel"] = jnp.asarray(
                np.asarray(kern, np.float32) + scale * (a @ b),
                ).astype(kern.dtype)
            node["base"] = base
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def quantize_llm_params(params: Any) -> Any:
    """Convert a (LoRA-free) LLM param tree to the ``quantized=True`` layout.

    Every ``.../base/{kernel}`` (the LoRADense projections) and the top-level
    ``lm_head/{kernel}`` become ``{kernel_q: int8, kernel_scale: fp32}``;
    everything else (embeddings, norms) is passed through unchanged. Works
    leaf-by-leaf on host so the source tree may be numpy arrays from a torch
    port — nothing needs to fit on-device in the source dtype.
    """
    def convert_dense(node: Dict[str, Any]) -> Dict[str, Any]:
        q, s = quantize_kernel(node["kernel"])
        out = {k: v for k, v in node.items() if k != "kernel"}
        out["kernel_q"] = jnp.asarray(q)
        out["kernel_scale"] = jnp.asarray(s)
        return out

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and name in ("base", "lm_head"):
            return convert_dense(node)
        return {k: walk(v, k) for k, v in node.items()}

    return walk(params)


def quantize_agent(agent, alpha: Optional[float] = None):
    """ContinuousLVLM → int8-LLM ContinuousLVLM (merge LoRA, quantize).

    The resamplers (a few hundred MB at SEED-X scale) stay in the compute
    dtype. The returned agent's ``llm`` is a ``lora_rank=0, quantized=True``
    model; ``generate``/``loss`` signatures are unchanged (training through
    int8 weights is not supported — this is the serving path).
    """
    import jax

    from diffsensei_tpu.models.mllm.llama import LlamaForCausalLM

    for path, leaf in jax.tree_util.tree_flatten_with_path(
            agent.llm_params)[0]:
        if isinstance(leaf, jax.ShapeDtypeStruct):
            raise ValueError(
                "cannot quantize an abstract param tree — the agent "
                f"checkpoint did not cover {jax.tree_util.keystr(path)}; "
                "load real LLM weights first (utils.load.load_agent_weights)")

    merged = merge_llm_lora(agent.llm_params, alpha=alpha)
    qparams = quantize_llm_params(merged)
    qllm = LlamaForCausalLM(agent.llm.config, lora_rank=0, remat=False,
                            quantized=True, dtype=agent.llm.dtype,
                            param_dtype=agent.llm.param_dtype)
    return dataclasses.replace(agent, llm=qllm, llm_params=qparams)
