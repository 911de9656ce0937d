"""Generic training loop: steps, logging, checkpointing, resume.

The loop shared by the three stage entry points (the reference duplicates it
across ``train_t2i.py:205-370``, ``train.py:287-499``, ``train_mllm.py:281-493``):
prefetching loader → jitted step → metric logging → checkpoint rotation →
resume. Differences from the reference:

* resume restores the FULL train state (optimizer, RNG, step) — the reference
  reloads weights only and fast-forwards the dataloader
  (``train_mllm.py:313-316``);
* gradient accumulation is ``optax.MultiSteps`` wrapped around the optimizer
  (exact running average, no Python-side accumulation);
* one compiled program per bucket shape (jit keyed on batch shapes);
* preemption-aware: SIGTERM/SIGINT triggers a final checkpoint before exit
  (the reference has no failure handling at all, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import signal
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from diffsensei_tpu.train.checkpoint import CheckpointManager
from diffsensei_tpu.train.diffusion import TrainState
from diffsensei_tpu.utils.observability import (
    MetricsLogger, StepTimer, device_memory_stats)


@dataclasses.dataclass
class RunConfig:
    max_train_steps: int
    log_dir: str
    log_every: int = 50
    checkpoint_every: int = 1000
    # explicit extra checkpoint steps (reference ``checkpointing_steps`` list,
    # configs/train/diffsensei/self_0.5.yaml:59-60 — used to snapshot at
    # hand-picked milestones on top of the interval cadence)
    checkpoint_steps: tuple = ()
    checkpoints_total_limit: Optional[int] = 5
    seed: int = 0
    resume: bool = False
    memory_log_every: int = 500


def run_training(step_fn: Callable, state: TrainState,
                 batches: Iterable[Any], cfg: RunConfig,
                 donate_state: bool = True, frozen=None) -> TrainState:
    """Drive ``step_fn(state, frozen, batch, rng) -> (state, metrics)`` to
    completion. ``frozen`` (a :class:`FrozenDiffusionStack` or None) is passed
    through as a traced argument every step — per-call cost is pointer
    passing, and the multi-GB frozen trees never become program constants."""
    jit_step = jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
    ckpt = CheckpointManager(cfg.log_dir, cfg.checkpoints_total_limit)
    metrics_log = MetricsLogger(cfg.log_dir)
    timer = StepTimer()
    rng = jax.random.key(cfg.seed)

    start_step = int(state.step)
    if cfg.resume:
        try:
            abstract = jax.tree.map(np.zeros_like, jax.device_get(state))
            restored, r_rng, step = ckpt.restore(abstract, with_rng=True)
            # restore each leaf to the INCOMING state's sharding — a bare
            # jnp.asarray would silently replicate FSDP-sharded params and
            # moments on every device (memory blowup on resume)
            state = jax.tree.map(
                lambda r, s: (jax.device_put(r, s.sharding)
                              if hasattr(s, "sharding") else jax.numpy.asarray(r)),
                restored, state)
            if r_rng is not None:
                rng = r_rng
            start_step = step
            print(f"resumed from step {step}")
        except FileNotFoundError:
            pass

    # preemption: checkpoint on SIGTERM/SIGINT, then exit the loop cleanly
    interrupted = {"flag": False}

    def _on_signal(signum, frame):
        interrupted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:   # non-main thread (tests)
            pass

    step = start_step
    for batch in batches:
        if step >= cfg.max_train_steps or interrupted["flag"]:
            break
        timer.data_ready()
        step_rng = jax.random.fold_in(rng, step)
        state, metrics = jit_step(state, frozen, batch, step_rng)
        if (step + 1) % cfg.log_every == 0 or step + 1 == cfg.max_train_steps:
            jax.block_until_ready(metrics)
            timer.step_done()
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars.update(timer.scalars())
            if (step + 1) % cfg.memory_log_every == 0:
                scalars.update(device_memory_stats())
            metrics_log.log(step + 1, scalars)
        else:
            timer.step_done()
        step += 1
        if (step % cfg.checkpoint_every == 0 or step == cfg.max_train_steps
                or step in cfg.checkpoint_steps):
            ckpt.save(step, jax.device_get(state), rng=rng)

    if step > start_step and step % cfg.checkpoint_every != 0 \
            and step != cfg.max_train_steps:
        ckpt.save(step, jax.device_get(state), rng=rng)
    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    metrics_log.close()
    return state
