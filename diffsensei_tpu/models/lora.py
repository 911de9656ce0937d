"""UNet LoRA: Dense-compatible low-rank adapters + tree utilities.

The reference trains the UNet with peft LoRA in stages 1 and 2
(``scripts/train/train_t2i.py:103-115``, ``scripts/train/train.py:162-174``):
``LoraConfig(r=lora_rank, lora_alpha=lora_rank, init_lora_weights="gaussian",
target_modules=["to_k", "to_q", "to_v", "to_out.0"])`` applied via
``unet.add_adapter`` — i.e. every attention projection (self- and cross-attn)
gains an additive low-rank path, and in stage 2 the trainable set is the LoRA
params plus the ``_ip`` projections (``train.py:163-165`` freezes everything
without ``_ip`` in the name before adding adapters).

TPU-native design: :class:`LoRADense` declares its base ``kernel``/``bias``
params at the module level — the exact param-tree layout of ``nn.Dense`` — so
a ``lora_rank=0`` model, a ``lora_rank>0`` model, and every existing porter
and exporter share base-weight paths. LoRA leaves are two extra siblings
(``lora_a``, ``lora_b``); the torch exporters read only ``kernel``/``bias``
and therefore drop adapters automatically, and :func:`merge_lora_params`
folds trained adapters into the kernels for rank-0 serving.

(The SEED-X LLaMA keeps its own ``LoRADense`` in ``models/mllm/llama.py``
with a nested ``base`` Dense — its porters/exports already target that
layout; the two are intentionally separate.)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# peft ``init_lora_weights="gaussian"``: A ~ N(0, 1/r), B = 0 — the adapter
# starts as an exact no-op but with nonzero gradient for both factors
# (zeros-init A would make BOTH factor gradients vanish identically).
def _lora_a_init(rank: int):
    return nn.initializers.normal(stddev=1.0 / rank)


class LoRADense(nn.Module):
    """``x @ W (+ b) + (alpha/r) * (x @ A) @ B`` with Dense-identical params.

    ``lora_alpha=None`` means ``alpha = rank`` — scale 1.0, matching the
    reference config ``lora_alpha=config.model.lora_rank`` (train.py:168-169).

    ``quantized=True`` swaps the base kernel for weight-only int8
    (per-output-channel symmetric: ``kernel_q`` int8 [in, out] +
    ``kernel_scale`` fp32 [out], ``y = (x @ Q) * s``) — the serving layout
    produced by ``models.quant_unet.quantize_unet_params``. The per-channel
    scale factors out of the contraction, so XLA reads the int8 matrix
    straight from HBM and fuses one multiply on the output. Bias and LoRA
    adapters (QLoRA-style: int8 frozen base, adapters in compute dtype) are
    unchanged. Serving-only — no grad path intended through ``kernel_q``.
    """

    features: int
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    use_bias: bool = True
    quantized: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        x = x.astype(self.dtype)
        if self.quantized:
            # random init mirrors models/mllm/llama.py::Int8Dense — uniform
            # ±127 ints have std ≈ 73.3, so scale 1/(73.3·sqrt(fan_in)) makes
            # the effective weights lecun-normal-like for benches
            def _q_init(key, shape, dtype=jnp.int8):
                return jax.random.randint(key, shape, -127, 128,
                                          jnp.int32).astype(dtype)

            def _s_init(key, shape, dtype=jnp.float32):
                del key
                return jnp.full(shape, 1.0 / (73.3 * in_features ** 0.5),
                                dtype)

            q = self.param("kernel_q", _q_init, (in_features, self.features))
            s = self.param("kernel_scale", _s_init, (self.features,))
            y = (x @ q.astype(self.dtype)) * s.astype(self.dtype)
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (in_features, self.features), self.param_dtype)
            y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            a = self.param("lora_a", _lora_a_init(self.lora_rank),
                           (x.shape[-1], self.lora_rank), self.param_dtype)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.lora_rank, self.features), self.param_dtype)
            alpha = self.lora_rank if self.lora_alpha is None else self.lora_alpha
            scale = jnp.asarray(alpha / self.lora_rank, self.dtype)
            y = y + scale * ((x @ a.astype(self.dtype)) @ b.astype(self.dtype))
        return y


# ---------------------------------------------------------------------------
# Tree utilities (operate on the UNet's {"params": {...}} pytree)
# ---------------------------------------------------------------------------
def _walk_modules(node):
    """Yield every dict that holds a ``lora_a`` leaf (i.e. a LoRADense scope)."""
    if isinstance(node, dict):
        if "lora_a" in node and "kernel" in node:
            yield node
        for v in node.values():
            yield from _walk_modules(v)


def merge_lora_params(params: Any, alpha: Optional[float] = None) -> Any:
    """Fold every ``lora_a @ lora_b`` into its base ``kernel`` and drop the
    adapter leaves — producing a tree loadable by a ``lora_rank=0`` model.

    This is the serve/export path for LoRA-trained checkpoints (the torch
    reference keeps adapters unmerged and lets peft handle them at runtime;
    on TPU a merged kernel keeps the hot path a single matmul).
    """
    params = jax.tree.map(lambda x: x, params)  # deep copy
    for node in _walk_modules(params):
        a, b = node.pop("lora_a"), node.pop("lora_b")
        rank = a.shape[-1]
        scale = (rank if alpha is None else alpha) / rank
        delta = (np.asarray(a, np.float32) @ np.asarray(b, np.float32)) * scale
        node["kernel"] = (jnp.asarray(np.asarray(node["kernel"], np.float32)
                                      + delta)
                          .astype(node["kernel"].dtype))
    return params


def ensure_lora_init(tree: dict, rank: int,
                     targets=("to_q", "to_k", "to_v", "to_out"),
                     seed: int = 0) -> int:
    """Make every target attention projection of a UNet param tree carry a
    live LoRA adapter: add missing ``lora_a``/``lora_b`` leaves and re-draw
    any all-zeros ``lora_a``.

    Two tree provenances need this (in-place) repair before training:

    * **ported checkpoints** — the torch porters build trees with no adapter
      leaves at all, so a ``lora_rank>0`` model cannot apply them;
    * **``init="zeros"`` trees** — the serving fast path zero-fills every
      leaf, and a zeros ``lora_a`` is a dead adapter: with ``B = 0`` too,
      ``dL/dA = x^T (dy B^T) = 0`` and ``dL/dB = (xA)^T dy = 0`` identically.

    Re-draws use ``A ~ N(0, 1/r)``, ``B = 0`` (the reference
    ``init_lora_weights="gaussian"``, train.py:170). Properly-initialized
    adapters (random init or restored checkpoints) are left untouched.
    Deterministic in ``seed`` + traversal order; returns adapters touched.
    """
    rng = np.random.default_rng(seed)
    touched = 0

    def walk(node):
        nonlocal touched
        if not isinstance(node, dict):
            return
        for key, value in node.items():
            if (key in targets and isinstance(value, dict)
                    and "kernel" in value):
                kern = value["kernel"]
                d_in, d_out = int(kern.shape[0]), int(kern.shape[1])
                a = value.get("lora_a")
                if a is None or not bool(np.any(np.asarray(a))):
                    value["lora_a"] = jnp.asarray(
                        rng.normal(0.0, 1.0 / rank, (d_in, rank)), kern.dtype)
                    value.setdefault("lora_b",
                                     jnp.zeros((rank, d_out), kern.dtype))
                    touched += 1
            elif isinstance(value, dict):
                walk(value)
    walk(tree)
    return touched
