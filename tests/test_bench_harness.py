"""Unit tests for bench.py's timeout-proofing primitives (VERDICT r3 weak #1).

The round-3 bench artifact was lost to a driver timeout; the harness now
treats the artifact as the product — these tests pin the deadline/budget
logic without touching JAX or the chip (bench.py's module level is
import-safe: heavy imports happen inside main())."""

import importlib
import sys


def _fresh_bench(monkeypatch, deadline="1200", budget="180"):
    monkeypatch.setenv("BENCH_DEADLINE_S", deadline)
    monkeypatch.setenv("BENCH_RETRY_SLEEP_S", budget)
    sys.modules.pop("bench", None)
    sys.path.insert(0, ".")
    return importlib.import_module("bench")


def test_pause_consumes_cumulative_budget(monkeypatch):
    bench = _fresh_bench(monkeypatch, budget="5")
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    assert bench._pause(3, "a") is True
    assert bench._pause(3, "b") is True          # only 2s of budget left
    assert bench._pause(3, "c") is False         # budget exhausted: no sleep
    assert sum(slept) <= 5.0 + 1e-6
    assert len(slept) == 2


def test_pause_respects_deadline(monkeypatch):
    bench = _fresh_bench(monkeypatch, deadline="30", budget="600")
    # 30s deadline minus the 60s reserve -> nothing left to sleep
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: (_ for _ in ()).throw(AssertionError(
                            "slept past the deadline")))
    assert bench._pause(60, "contention") is False


def test_time_left_decreases(monkeypatch):
    bench = _fresh_bench(monkeypatch, deadline="1200")
    t0 = bench._time_left()
    assert 0 < t0 <= 1200
    monkeypatch.setattr(bench.time, "monotonic",
                        lambda: bench._T0 + 100.0)
    assert abs(bench._time_left() - 1100.0) < 1e-6


def test_mllm_leg_reuses_marker(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch)
    marker_dir = tmp_path / ".bench-cache"
    marker_dir.mkdir()
    (marker_dir / "mllm13b.json").write_text(
        '{"mllm_13b_int8_tokens_per_sec": 46.1, "mllm_13b_decode_s": 2.774}')
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    got = bench._mllm_13b_leg()
    assert got["mllm_13b_decode_s"] == 2.774


def test_mllm_leg_skips_on_deadline_without_marker(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch, deadline="30")
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))   # no marker
    assert bench._mllm_13b_leg() is None                 # skipped, no spawn


def test_marker_roundtrip_and_anchor_validation(monkeypatch, tmp_path):
    """VERDICT r4 next #2: cached leg measurements survive deadline-tight
    runs, but a marker recorded under a different code state (device anchor
    off by >10%) is discarded."""
    bench = _fresh_bench(monkeypatch)
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    assert bench._load_marker("batched.json") is None
    bench._save_marker("batched.json", {"anchor_device_ms": 100.0,
                                        "batched_bs2_panels_per_sec": 0.4})
    m = bench._load_marker("batched.json", anchor_ms=105.0)
    assert m and m["batched_bs2_panels_per_sec"] == 0.4
    assert bench._load_marker("batched.json", anchor_ms=120.0) is None
    assert bench._load_marker("batched.json") is not None  # no anchor check
    # corrupt marker = no marker
    (tmp_path / ".bench-cache" / "batched.json").write_text("{nope")
    assert bench._load_marker("batched.json") is None
