"""Parameter-efficient fine-tuning selection for the SEED-X LLM.

Capability match for ``src/models/mllm/peft_models.py:9-97``
(``get_peft_model_with_resize_embedding``): the reference wraps the LLaMA fork
in HF peft LoRA (r=64 on q/k/v/o/gate/down/up, ``configs/train/diffsensei/mllm.yaml:15-31``),
keeps input/output embeddings + norms trainable (``peft_models.py:36-37``,
``modules_to_save``), resizes the vocab to 32330 for the image tokens
(``:28-29``), and offers two alternates: ``trained_layers="later_10"`` (top
layers only, ``:45-63``) and suffix-matched ``trained_parameters`` (``:64-78``).

In this framework LoRA is native to ``LoRADense`` (``models/mllm/llama.py``), so
PEFT is pure **mask selection** over the param pytree, consumed by
``train.optim.make_optimizer`` — no model wrapping, no weight merging at train
time. ``resize_vocab`` grows ported embedding/lm_head tables for the image
tokens (new rows init from the mean embedding, the HF resize convention).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence

import jax
import numpy as np


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def lora_trainable_mask(llm_params: Any,
                        train_embeddings: bool = True,
                        train_norms: bool = True) -> Any:
    """LoRA adapters (+ embeddings, norms) trainable; base kernels frozen.

    Mirrors the reference peft config: LoRA on all projections,
    ``modules_to_save`` = norms, embeddings kept trainable.
    """
    def decide(path, _):
        name = _path_str(path)
        if "lora_a" in name or "lora_b" in name:
            return True
        if train_embeddings and ("embed_tokens" in name or "lm_head" in name):
            return True
        if train_norms and ("input_norm" in name or "post_norm" in name
                            or re.search(r"(^|\.)norm\.", name + ".")):
            return True
        return False

    return jax.tree_util.tree_map_with_path(decide, llm_params)


def later_layers_mask(llm_params: Any, num_layers: int,
                      train_last: int = 10) -> Any:
    """``trained_layers="later_10"`` (reference ``peft_models.py:45-63``):
    only the top ``train_last`` decoder layers + final norm + lm_head train."""
    first = num_layers - train_last

    def decide(path, _):
        name = _path_str(path)
        m = re.search(r"layers_(\d+)", name)
        if m:
            return int(m.group(1)) >= first
        return ("lm_head" in name) or name.endswith("norm.weight") \
            or ".norm." in name + "."

    return jax.tree_util.tree_map_with_path(decide, llm_params)


def suffix_trainable_mask(llm_params: Any,
                          trained_parameters: Sequence[str]) -> Any:
    """Suffix-matched selection (reference ``peft_models.py:64-78``)."""
    def decide(path, _):
        name = _path_str(path)
        return any(name.endswith(sfx) or sfx in name
                   for sfx in trained_parameters)

    return jax.tree_util.tree_map_with_path(decide, llm_params)


def resize_vocab(llm_params: Dict, new_vocab_size: int) -> Dict:
    """Grow embed_tokens/lm_head to ``new_vocab_size`` (reference resizes to
    32330 for ``<img>``/``<img_k>``/``</img>``/loc tokens, ``mllm.yaml:32``).
    New rows take the mean of existing embeddings (HF convention)."""
    p = llm_params["params"]
    emb = np.asarray(p["embed_tokens"]["embedding"])
    old = emb.shape[0]
    if new_vocab_size < old:
        raise ValueError(f"cannot shrink vocab {old} -> {new_vocab_size}")
    if new_vocab_size > old:
        mean = emb.mean(axis=0, keepdims=True)
        p["embed_tokens"]["embedding"] = np.concatenate(
            [emb, np.repeat(mean, new_vocab_size - old, axis=0)], axis=0)
        head = np.asarray(p["lm_head"]["kernel"])          # [hidden, vocab]
        mean_h = head.mean(axis=1, keepdims=True)
        p["lm_head"]["kernel"] = np.concatenate(
            [head, np.repeat(mean_h, new_vocab_size - old, axis=1)], axis=1)
    return llm_params
