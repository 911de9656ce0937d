"""Checkpointing: full train-state save/restore with rotation + serving export.

The reference hand-rolls ``torch.save`` of partial state dicts into
``logs/<cfg>/<exp>/<ts>/step-<N>/ckpt.pth`` with oldest-first rotation
(``scripts/train/train.py:319-325,441-453``) and **loses optimizer and RNG
state** — resume is weights-only (SURVEY.md §5 "checkpoint/resume"). The TPU
build fixes that defect: Orbax checkpoints carry params, optimizer state, the
step counter, and the RNG key, so resume is exact; rotation semantics
(``checkpoints_total_limit``) and the ``step-<N>`` directory layout match the
reference. ``export_weights`` writes the serving artifact (trainable params
only — the analogue of the reference's ``{"image_proj", "unet_trained"}`` dict).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _step_dirs(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"step-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(root, name)))
    return [p for _, p in sorted(out)]


def latest_step_dir(root: str) -> Optional[str]:
    dirs = _step_dirs(root)
    return dirs[-1] if dirs else None


class CheckpointManager:
    """step-N directory checkpoints with total-limit rotation."""

    def __init__(self, root: str, total_limit: Optional[int] = None):
        self.root = os.path.abspath(root)
        self.total_limit = total_limit
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, rng: Optional[jax.Array] = None,
             extra: Optional[Dict[str, Any]] = None) -> str:
        path = os.path.join(self.root, f"step-{step}")
        payload = {"state": state}
        if rng is not None:
            payload["rng"] = jax.random.key_data(rng)
        if extra:
            payload["extra"] = extra
        self._ckpt.save(os.path.join(path, "ckpt"), payload, force=True)
        # StandardCheckpointer is async; barrier before rotation/return so
        # the step-N dir is durable when the train loop moves on.
        self._ckpt.wait_until_finished()
        self._rotate()
        return path

    def _rotate(self):
        if self.total_limit is None:
            return
        dirs = _step_dirs(self.root)
        while len(dirs) > self.total_limit:
            shutil.rmtree(dirs.pop(0), ignore_errors=True)

    def restore(self, abstract_state: Any, step: Optional[int] = None,
                with_rng: bool = False):
        """Restore into the structure of ``abstract_state`` (a matching pytree).

        Returns (state, rng, step) — rng None unless saved.
        """
        if step is None:
            path = latest_step_dir(self.root)
            if path is None:
                raise FileNotFoundError(f"no step-* checkpoints in {self.root}")
            step = int(path.rsplit("-", 1)[1])
        else:
            path = os.path.join(self.root, f"step-{step}")
        target = {"state": abstract_state}
        if with_rng:
            target["rng"] = np.zeros((2,), np.uint32)
        restored = self._ckpt.restore(os.path.join(path, "ckpt"), target)
        rng = None
        if with_rng and "rng" in restored:
            rng = jax.random.wrap_key_data(restored["rng"])
        return restored["state"], rng, step


def export_weights(path: str, params: Any) -> None:
    """Serving artifact: params only (no optimizer state)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()


def load_weights(path: str, abstract_params: Any) -> Any:
    return ocp.StandardCheckpointer().restore(os.path.abspath(path),
                                              abstract_params)
