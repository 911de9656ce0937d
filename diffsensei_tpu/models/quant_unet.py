"""Weight-only int8 quantization for the UNet serving path.

The reference serves the SEED-X agent AND the diffusion pipeline from one
GPU (``scripts/demo/gradio.py:255-283`` — ``agent_model.to('cuda:0')`` then
``pipeline.to('cuda:0')``). On a 16 GB v5e the two stacks only co-reside if
both shrink: the LLM goes int8/int4 (``models/mllm/quant.py``) and the UNet's
transformer matmuls — 4.75 of the 5.42 GiB bf16 tree at SDXL geometry — go
int8 here, dropping the resident UNet to ~3.0 GiB. The UNet forward at 1024²
is MXU-compute-bound (~55 ms against ~6 ms of weight traffic), so unlike the
bandwidth-bound LLM decode this is purely a *memory* lever; convs, norms and
time embeddings stay in the compute dtype.

Layout produced: every targeted projection's ``kernel`` [in, out] becomes
``kernel_q`` int8 + ``kernel_scale`` fp32 [out] (per-output-channel symmetric
— the scale factors out of the contraction so XLA streams int8 from HBM and
applies one output multiply). Consumed by ``UNetMangaModel(quantized=True)``
(``models/lora.py::LoRADense``). All math runs host-side in numpy so a full
SDXL tree converts without doubling device HBM.
"""

from __future__ import annotations

from typing import Any, FrozenSet, Tuple

import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.models.lora import merge_lora_params
from diffsensei_tpu.models.mllm.quant import quantize_kernel

# Every transformer matmul of UNetMangaModel (models/unet.py): attention
# projections (self + dual cross, incl. the trainable _ip pair), the
# Transformer2D in/out projections, and the GEGLU FFN projections (which
# reuse the proj_in/proj_out names under the ``ff`` scope).
UNET_QUANT_TARGETS: FrozenSet[str] = frozenset(
    {"to_q", "to_k", "to_v", "to_out", "to_k_ip", "to_v_ip",
     "proj_in", "proj_out"})


def _has_lora(node: Any) -> bool:
    if isinstance(node, dict):
        if "lora_a" in node:
            return True
        return any(_has_lora(v) for v in node.values())
    return False


def quantize_unet_params(params: Any,
                         targets: FrozenSet[str] = UNET_QUANT_TARGETS) -> Any:
    """UNet param tree → the ``UNetMangaModel(quantized=True)`` layout.

    LoRA adapters (if any) are merged into their base kernels first
    (``models/lora.py::merge_lora_params`` — int8 serving is rank-0), then
    every 2-D ``kernel`` under a target-named scope becomes
    ``{kernel_q, kernel_scale}``; biases and everything else pass through.
    """
    if _has_lora(params):
        params = merge_lora_params(params)

    def convert(node):
        q, s = quantize_kernel(np.asarray(node["kernel"], np.float32))
        out = {k: v for k, v in node.items() if k != "kernel"}
        out["kernel_q"] = jnp.asarray(q)
        out["kernel_scale"] = jnp.asarray(s)
        return out

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if (name in targets and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 2):
            return convert(node)
        return {k: walk(v, k) for k, v in node.items()}

    return walk(params)


def tree_bytes(params: Any) -> Tuple[int, int]:
    """(total bytes, int8 kernel bytes) of a param tree — for memory budgets."""
    import jax

    total = q = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not hasattr(leaf, "dtype"):
            continue
        b = int(np.prod(leaf.shape)) * jnp.dtype(leaf.dtype).itemsize
        total += b
        if jnp.dtype(leaf.dtype) == jnp.int8:
            q += b
    return total, q
