"""Observability: metrics JSONL, step timer, device memory stats."""

import json
import time

from diffsensei_tpu.utils.observability import (
    MetricsLogger, StepTimer, device_memory_stats)


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.log(10, {"loss": 1.5, "lr": 1e-4})
    log.log(20, {"loss": 1.25})
    log.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0] == {"step": 10, "loss": 1.5, "lr": 1e-4}
    assert recs[1]["step"] == 20


def test_step_timer_separates_data_and_step():
    # sleeps can overshoot hugely on a loaded machine (full-suite runs) —
    # assert only lower bounds, not the relative ordering of the two waits
    t = StepTimer()
    time.sleep(0.05)
    t.data_ready()
    time.sleep(0.01)
    t.step_done()
    s = t.scalars()
    assert s["time/data_s"] >= 0.045
    assert s["time/step_s"] >= 0.005


def test_device_memory_stats_keys():
    stats = device_memory_stats()
    assert set(stats) == {"mem/in_use_gib", "mem/peak_gib", "mem/limit_gib"}
    assert all(v >= 0 for v in stats.values())
