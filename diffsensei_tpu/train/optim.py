"""Optimizer + LR schedule registry for the training stages.

Mirrors the reference's ``scripts/train/scheduler.py`` registry (HF scheduler
names + a custom cosine with ``min_lr_ratio``, ``scheduler.py:18-68,83-128``)
and the AdamW settings from the train configs, rebuilt on optax.

Parameter-freezing replaces the reference's requires_grad bookkeeping
(``train.py:190-221``): ``unet_trainable_mask`` reproduces the four selection
modes ``full | lora | new | ip`` as a boolean pytree consumed by
``optax.masked`` (frozen leaves get zero updates and no optimizer state).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# LR schedules (scheduler.py:18-128)
# ---------------------------------------------------------------------------
def make_lr_schedule(
    name: str,
    base_lr: float,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    min_lr_ratio: float = 0.0,
    num_cycles: float = 0.5,
    power: float = 1.0,
    lr_end: float = 1e-7,
) -> optax.Schedule:
    """Every name the reference registry enumerates
    (``scripts/train/scheduler.py:71-80``) except ``reduce_on_plateau``,
    which is not a pure step→lr schedule (it consumes a validation metric;
    documented exclusion, PARITY.md §2.4). All released configs use
    ``constant``."""
    def warmup(step):
        if num_warmup_steps <= 0:
            return 1.0         # no warmup: full LR from step 0 (HF convention)
        return jnp.minimum(1.0, step / num_warmup_steps)

    def progress(step):
        return jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(num_training_steps - num_warmup_steps, 1),
            0.0, 1.0)

    if name == "constant":
        return lambda step: jnp.asarray(base_lr)
    if name == "constant_with_warmup":
        return lambda step: base_lr * warmup(step)
    if name == "linear":
        return lambda step: base_lr * warmup(step) * (1.0 - progress(step))
    if name in ("cosine", "cosine_with_min_lr"):
        # reference custom scheduler: cosine decaying to min_lr_ratio * base
        # (scheduler.py:18-68); plain "cosine" is min_lr_ratio = 0.
        floor = min_lr_ratio if name == "cosine_with_min_lr" else 0.0
        def sched(step):
            cos = 0.5 * (1.0 + jnp.cos(
                math.pi * 2.0 * num_cycles * progress(step)))
            return base_lr * warmup(step) * (floor + (1.0 - floor) * cos)
        return sched
    if name == "cosine_with_restarts":
        # HF semantics: num_cycles full cosine restarts over training
        # (transformers.optimization.get_cosine_with_hard_restarts_…)
        def sched(step):
            p = progress(step)
            phase = jnp.mod(jnp.maximum(num_cycles, 1) * p, 1.0)
            cos = jnp.where(p >= 1.0, 0.0,
                            0.5 * (1.0 + jnp.cos(math.pi * phase)))
            return base_lr * warmup(step) * cos
        return sched
    if name == "polynomial":
        # HF semantics: decay from base_lr to lr_end with ``power``
        def sched(step):
            decay = (lr_end + (base_lr - lr_end)
                     * (1.0 - progress(step)) ** power)
            return warmup(step) * jnp.where(step < num_warmup_steps,
                                            base_lr, decay)
        return sched
    if name == "inverse_sqrt":
        # HF semantics: lr ∝ 1/sqrt(step) with timescale = warmup steps
        timescale = num_warmup_steps or 10_000
        shift = timescale - num_warmup_steps
        def sched(step):
            decay = jax.lax.rsqrt(
                jnp.maximum((step + shift) / timescale, 1e-9))
            return base_lr * warmup(step) * jnp.where(
                step < num_warmup_steps, 1.0, decay)
        return sched
    raise ValueError(f"unknown lr schedule: {name}")


# ---------------------------------------------------------------------------
# Trainable-parameter selection (train.py:190-221)
# ---------------------------------------------------------------------------
def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return ".".join(parts)


def unet_trainable_mask(unet_params: Any, mode: str) -> Any:
    """Boolean pytree: which UNet params train under each reference mode.

    * ``full`` — everything;
    * ``new``  — IP projections and the dialog embedding (names containing
      ``_ip`` or ``dialog``, reference ``train.py:204-206``);
    * ``ip``   — IP projections only (``:207-209``);
    * ``lora`` — LoRA adapter leaves (``lora_a``/``lora_b``, see
      ``models/lora.py``) plus the IP projections: the reference freezes
      everything without ``_ip`` in the name, then adds peft adapters with
      requires_grad on (``train.py:163-174``), so its trainable set under
      'lora' is exactly {adapters} ∪ {``_ip`` params}.

    Raises if a mode selects zero parameters — a misconfigured run (e.g.
    mode='lora' on a ``lora_rank=0`` model) must fail loudly, not burn a
    training budget updating nothing.
    """
    def decide(path, _):
        name = _path_str(path)
        if mode == "full":
            return True
        if mode == "new":
            return ("_ip" in name) or ("dialog" in name)
        if mode == "ip":
            return "_ip" in name
        if mode == "lora":
            return ("lora_" in name) or ("_ip" in name)
        raise ValueError(f"unknown unet_trained_parameters mode: {mode}")

    mask = jax.tree_util.tree_map_with_path(decide, unet_params)
    if not any(jax.tree.leaves(mask)):
        raise ValueError(
            f"unet_trained_parameters mode '{mode}' selects zero parameters"
            + (" — the model was built with lora_rank=0; set model.lora_rank"
               if mode == "lora" else ""))
    return mask


def make_optimizer(
    learning_rate: optax.Schedule | float,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW (+ global-norm clip) restricted to the trainable subtree.

    Frozen leaves get ``set_to_zero`` via ``multi_transform`` (``optax.masked``
    would pass their raw gradients through as updates).
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                             weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def count_params(tree: Any, mask: Optional[Any] = None) -> int:
    leaves = jax.tree.leaves(tree)
    if mask is None:
        return sum(int(x.size) for x in leaves)
    flags = jax.tree.leaves(mask)
    return sum(int(x.size) for x, f in zip(leaves, flags) if f)


def partition_params(params: Any, mask: Any):
    """Split a param tree into (trainable_flat, frozen_flat) path dicts.

    Differentiating only the trainable subtree avoids allocating gradients
    for frozen params — stage 2's default mode ('new') trains ~4% of the
    UNet, so full-tree grads would waste ~5 GB at SDXL scale.
    """
    from flax import traverse_util

    fp = traverse_util.flatten_dict(params, sep="/")
    fm = traverse_util.flatten_dict(mask, sep="/")
    trainable = {k: v for k, v in fp.items() if fm[k]}
    frozen = {k: v for k, v in fp.items() if not fm[k]}
    return trainable, frozen


def merge_partitioned(trainable_flat: Any, frozen_flat: Any) -> Any:
    """Inverse of ``partition_params``."""
    import jax.lax
    from flax import traverse_util

    frozen_flat = {k: jax.lax.stop_gradient(v)
                   for k, v in frozen_flat.items()}
    return traverse_util.unflatten_dict({**trainable_flat, **frozen_flat},
                                        sep="/")


def filter_trainable(params: Any, mask: Any) -> Any:
    """Trainable-only subtree for weight export — the analogue of the
    reference's ``get_trained_state_dict`` (``scripts/utils.py:15-21``,
    requires_grad filter used for stage-2/3 checkpoints). Frozen leaves
    become None (dropped by Orbax)."""
    return jax.tree.map(lambda p, m: p if m else None, params, mask)
