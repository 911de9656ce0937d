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


def quantize_kernel_int4(w: np.ndarray,
                         group: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Group-wise symmetric int4: w[in, out] → (packed, scale[in/G, F']).

    AWQ/GPTQ-family layout (PAPERS.md): one fp32 scale per (input-group,
    output-channel), G = gcd(group, in) so any width divides evenly. Range
    ±7 (the -8 code is unused — symmetric). Output columns are zero-padded
    to F' = ``ops.int4_matmul.padded_features`` (pad-column scales are 1)
    and the nibbles packed two-per-byte in the split-half layout consumed by
    ``models.mllm.llama.Int4Dense`` — ``jnp.int4`` is one byte per element
    on this runtime, so real 4-bit residency needs host-side packing.
    Returns (uint8 [in, F'/2], fp32 [in/G, F']).
    """
    import math

    from diffsensei_tpu.ops.int4_matmul import pack_int4_host, padded_features

    w = np.asarray(w, np.float32)
    in_f, out_f = w.shape
    g = math.gcd(group, in_f)
    padded = padded_features(out_f, in_f, group)
    if padded != out_f:
        w = np.concatenate(
            [w, np.zeros((in_f, padded - out_f), np.float32)], axis=1)
    wg = w.reshape(in_f // g, g, padded)
    absmax = np.max(np.abs(wg), axis=1)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(wg / scale[:, None, :]), -7, 7).astype(np.int8)
    return pack_int4_host(q.reshape(in_f, padded)), scale


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


def quantize_llm_params(params: Any, bits: int = 8) -> Any:
    """Convert a (LoRA-free) LLM param tree to the quantized layout.

    Every ``.../base/{kernel}`` (the LoRADense projections) and the top-level
    ``lm_head/{kernel}`` become ``{kernel_q, kernel_scale}`` — int8
    per-output-channel (``bits=8``, the ``quantized=True`` layout) or int4
    group-wise (``bits=4``, the ``quantized="int4"`` layout that co-resides
    with the diffusion stack on one 16 GB chip); everything else (embeddings,
    norms) is passed through unchanged. Works leaf-by-leaf on host so the
    source tree may be numpy arrays from a torch port — nothing needs to fit
    on-device in the source dtype.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def convert_dense(node: Dict[str, Any]) -> Dict[str, Any]:
        out = {k: v for k, v in node.items() if k != "kernel"}
        if bits == 4:
            q, s = quantize_kernel_int4(node["kernel"])
            out["kernel_q"] = jnp.asarray(q)   # packed uint8 [in, F'/2]
        else:
            q, s = quantize_kernel(node["kernel"])
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


def quantize_agent(agent, alpha: Optional[float] = None, bits: int = 8):
    """ContinuousLVLM → quantized-LLM ContinuousLVLM (merge LoRA, quantize).

    ``bits=8`` (default) → int8 per-output-channel; ``bits=4`` → group-wise
    int4 (~6.1 GiB at 13B — the single-chip CO-RESIDENT topology where agent
    and diffusion stack serve from one 16 GB v5e, reference
    ``gradio.py:255-283``). The resamplers (a few hundred MB at SEED-X scale)
    stay in the compute dtype. The returned agent's ``llm`` is a
    ``lora_rank=0`` quantized model; ``generate``/``loss`` signatures are
    unchanged (training through quantized weights is not supported — this is
    the serving path).
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
    qparams = quantize_llm_params(merged, bits=bits)
    qllm = LlamaForCausalLM(agent.llm.config, lora_rank=0, remat=False,
                            quantized="int4" if bits == 4 else True,
                            dtype=agent.llm.dtype,
                            param_dtype=agent.llm.param_dtype)
    return dataclasses.replace(agent, llm=qllm, llm_params=qparams)
