"""End-to-end CLI smoke test: config → dataset → sharded train → checkpoint."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_cli_stage2_smoke(tmp_path):
    root = tmp_path / "smoke"
    root.mkdir()
    # synthetic dataset on disk
    anns = []
    rng = np.random.default_rng(0)
    for p in range(2):
        img = Image.fromarray(
            rng.integers(0, 255, (600, 400, 3), np.uint8))
        img.save(root / f"page_{p}.jpg")
        anns.append({
            "image_path": f"page_{p}.jpg",
            "frames": [{
                "bbox": [0, 0, 400, 300],
                "caption": "a test panel",
                "characters": [
                    {"id": 1, "bbox": [10, 10, 120, 200], "type": 0},
                    {"id": 2, "bbox": [200, 50, 380, 280], "type": 0},
                ],
                "dialogs": [{"bbox": [30, 20, 150, 90]}],
            }],
        })
    with open(root / "annotations.json", "w") as f:
        json.dump(anns, f)

    config = f"""
stage: condition
model:
  preset: tiny
  unet_trained_parameters: new
  ip_contrastive_loss: fast
train_data:
  ann_path: {root}/annotations.json
  image_root: {root}
  batch_size: 2
  max_num_ip_sources: 1
optimizer: {{lr: 1.0e-4}}
lr_scheduler: {{name: constant}}
trainer:
  max_train_steps: 2
  log_dir: {root}/logs
  log_every: 1
  checkpoint_every: 2
  seed: 0
"""
    cfg_path = root / "config.yaml"
    cfg_path.write_text(config)

    from diffsensei_tpu.train.cli import main
    main(["--config", os.fspath(cfg_path)])

    # checkpoint written + metrics logged
    assert os.path.isdir(root / "logs" / "step-2")
    metrics = (root / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(metrics[-1])
    assert rec["step"] == 2
    assert np.isfinite(rec["loss"])

    # stage 3 smoke on the same synthetic data
    config_mllm = config.replace("stage: condition", "stage: mllm").replace(
        f"log_dir: {root}/logs", f"log_dir: {root}/logs_mllm").replace(
        "  ip_contrastive_loss: fast\n", "  mllm_loss_weight: 0.5\n").replace(
        "  max_num_ip_sources: 1",
        "  max_num_ip_sources: 1\n  max_token_length: 48")
    cfg3 = root / "config_mllm.yaml"
    cfg3.write_text(config_mllm)
    main(["--config", os.fspath(cfg3)])
    rec = json.loads((root / "logs_mllm" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["loss_lm"]) and np.isfinite(rec["loss_rec"])

    # FSDP variant of the condition stage (trainer.parallel: fsdp, ZeRO-3
    # over the data axis; fsdp_min_size 0 so even the tiny preset's small
    # leaves actually shard)
    config_fsdp = config.replace(
        f"log_dir: {root}/logs", f"log_dir: {root}/logs_fsdp").replace(
        "  seed: 0", "  seed: 0\n  parallel: fsdp\n  fsdp_min_size: 0")
    cfg4 = root / "config_fsdp.yaml"
    cfg4.write_text(config_fsdp)
    main(["--config", os.fspath(cfg4)])
    rec = json.loads((root / "logs_fsdp" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert rec["step"] == 2
    assert np.isfinite(rec["loss"])
