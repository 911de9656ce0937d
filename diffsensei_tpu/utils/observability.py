"""Metrics, step timing, device-memory reporting, and profiler traces.

TPU-native replacement for the reference's observability (SURVEY.md §5):
TensorBoard scalars (``train.py:467-468``), tqdm step/data-time postfix
(``train.py:333-335,461-462``), and the rank-tagged CUDA memory printer
(``scripts/utils.py:4-12``).

* ``MetricsLogger`` writes JSONL always (greppable, no deps) and mirrors to
  TensorBoard when ``tensorboard`` is importable.
* ``StepTimer`` measures data-wait vs step time like the reference's tqdm
  postfix.
* ``device_memory_stats`` reads ``jax.Device.memory_stats()`` (the CUDA
  ``memory_allocated`` analogue).
* ``profile_trace`` wraps ``jax.profiler.trace`` for on-demand TPU traces —
  the systematic profiling the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        try:  # tensorboard is optional in the TPU image
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, Any]) -> None:
        record = {"step": int(step)}
        for k, v in scalars.items():
            record[k] = float(v)
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """data-wait vs compute timing, like the reference tqdm postfix."""

    def __init__(self):
        self._last = time.perf_counter()
        self.data_s = 0.0
        self.step_s = 0.0

    def data_ready(self):
        now = time.perf_counter()
        self.data_s = now - self._last
        self._last = now

    def step_done(self):
        now = time.perf_counter()
        self.step_s = now - self._last
        self._last = now

    def scalars(self) -> Dict[str, float]:
        return {"time/data_s": self.data_s, "time/step_s": self.step_s}


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    gib = 1024 ** 3
    return {
        "mem/in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "mem/peak_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "mem/limit_gib": stats.get("bytes_limit", 0) / gib,
    }


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with profile_trace(dir):`` captures a TPU trace viewable in XProf."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
