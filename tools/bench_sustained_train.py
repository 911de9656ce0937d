"""Sustained multi-bucket stage-2 training through the REAL CLI path.

VERDICT r4 next #6: every training number so far is single-step p50 at one
shape; the reference's core training mode is bucketed multi-shape epochs
(``src/datasets/dataset_size_bucket.py:488-544``). This tool runs ≥20
consecutive stage-2 steps on the chip through ``train/cli.py`` — synthetic
on-disk dataset whose frames land in BOTH the 512²-class (batch 4, the
reference's 4×-per-class scaling) and the 1024²-class (batch 1) buckets —
and reports:

* sustained steps/s and panels/s (excluding the compile steps),
* data-wait fraction (``StepTimer`` — PIL decode/resize + VAE-input prep
  overlap vs device compute),
* the compile count (must be EXACTLY 2 — one program per (bucket, batch)
  key; a third would mean shape leakage through the collate path).

Config mirrors the measured-best single-chip setup: preset sdxl,
``param_dtype: bfloat16`` (trees built in final dtype), ``remat_policy:
dots``, ``unet_trained_parameters: new`` (stage-2 partitioned trainables).

Writes `.bench-cache/sustained.json`. Run: python tools/bench_sustained_train.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
MARKER = os.path.join(_REPO, ".bench-cache", "sustained.json")
# 24 total so that >=20 steady steps remain after the two compile steps are
# excluded (VERDICT r4 #6 asks for >=20 sustained steps).
STEPS = int(os.environ.get("SUSTAIN_STEPS", "24"))
COMPILE_THRESHOLD_S = 30.0


def build_dataset(root: str) -> str:
    """Synthetic pages: per page one 512×512 frame and one 1024×1024 frame,
    so the bucket dataset populates both size classes."""
    import numpy as np
    from PIL import Image

    anns = []
    rng = np.random.default_rng(0)
    for p in range(8):
        img = Image.fromarray(
            rng.integers(0, 255, (1536, 1100, 3), np.uint8))
        img.save(os.path.join(root, f"page_{p}.jpg"))
        frames = []
        for (x0, y0, x1, y1) in ((0, 0, 512, 512), (0, 512, 1024, 1536)):
            frames.append({
                "bbox": [x0, y0, x1, y1],
                "caption": f"panel {p} at {x1 - x0}",
                "characters": [
                    {"id": 1, "bbox": [x0 + 10, y0 + 10, x0 + 150,
                                       y0 + 220], "type": 0},
                    {"id": 2, "bbox": [x0 + 250, y0 + 60, x0 + 430,
                                       y0 + 300], "type": 0},
                ],
                "dialogs": [{"bbox": [x0 + 30, y0 + 20, x0 + 170, y0 + 95]}],
            })
        anns.append({"image_path": f"page_{p}.jpg", "frames": frames})
    path = os.path.join(root, "annotations.json")
    with open(path, "w") as f:
        json.dump(anns, f)
    return path


def main() -> dict:
    root = tempfile.mkdtemp(prefix="sustained")
    ann = build_dataset(root)
    log_dir = os.path.join(root, "logs")
    cfg = f"""
stage: condition
model:
  preset: sdxl
  param_dtype: bfloat16
  init: zeros
  unet_trained_parameters: new
  remat: true
  remat_policy: dots
  ip_contrastive_loss: fast
train_data:
  ann_path: {ann}
  image_root: {root}
  batch_size: 16
  num_workers: 8
  max_num_ip_sources: 2
optimizer: {{lr: 1.0e-4}}
lr_scheduler: {{name: constant}}
trainer:
  max_train_steps: {STEPS}
  log_dir: {log_dir}
  log_every: 1
  checkpoint_every: 100000
  seed: 0
"""
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "diffsensei_tpu.train.cli",
         "--config", cfg_path],
        cwd=_REPO, text=True, capture_output=True,
        timeout=int(os.environ.get("SUSTAIN_TIMEOUT", "5400")))
    wall = time.perf_counter() - t0
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-5000:])
        raise SystemExit(f"train CLI failed rc={proc.returncode}")

    rows = [json.loads(l)
            for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert len(rows) >= STEPS, f"only {len(rows)} logged steps"
    rows = rows[:STEPS]
    compiles = [r for r in rows if r["time/step_s"] > COMPILE_THRESHOLD_S]
    steady = [r for r in rows if r["time/step_s"] <= COMPILE_THRESHOLD_S]
    step_s = [r["time/step_s"] for r in steady]
    data_s = [r["time/data_s"] for r in steady]
    # exact per-step panel counts are logged by the step itself
    # (train/diffusion.py::_panel_count — sum of the loss mask); inferring
    # batch composition from step times fails here because the 512²-batch-4
    # and 1024²-batch-1 step times coincide (~0.45-0.50 s on v5e).
    panels = sum(r["panels"] for r in steady)
    losses = [r["loss"] for r in rows]
    losses_finite = all(l == l for l in losses)   # NaN != NaN

    result = {
        "sustained_steps": len(steady),
        "n_compiles": len(compiles),
        "compile_s": [round(r["time/step_s"], 1) for r in compiles],
        "sustained_steps_per_sec": round(
            len(steady) / (sum(step_s) + sum(data_s)), 3),
        "sustained_panels_per_sec": round(
            panels / (sum(step_s) + sum(data_s)), 3),
        "mean_step_s": round(sum(step_s) / len(step_s), 3),
        "data_wait_frac": round(
            sum(data_s) / (sum(step_s) + sum(data_s)), 4),
        "buckets": "512^2-class (batch 4) + 1024^2-class (batch 1)",
        "total_wall_s": round(wall, 1),
        "losses_finite": losses_finite,
    }
    # NOTE: a long step is not necessarily a compile — the tunnel chip is
    # externally time-shared and a contention stall also exceeds the
    # threshold (round-5 first run: a 408 s stall at step 6 on top of the
    # two real compiles). With a warm persistent compile cache the two
    # expected "compiles" collapse to fast deserializes and any remaining
    # long step is contention.
    ok_compiles = len(compiles) <= 2
    result["exactly_two_compiles"] = len(compiles) == 2
    os.makedirs(os.path.dirname(MARKER), exist_ok=True)
    with open(MARKER, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)
    if not ok_compiles:
        print(f"# WARNING: expected <=2 long (compile) steps, saw "
              f"{len(compiles)} — extra ones are likely contention stalls",
              flush=True)
    if not losses_finite:
        print("# WARNING: non-finite loss in the run — throughput is still "
              "valid but investigate before publishing", flush=True)
    return result


if __name__ == "__main__":
    main()
