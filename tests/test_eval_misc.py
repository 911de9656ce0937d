"""Eval datasets, downloader stitch, attn-pool ViT, examples presets."""

import random

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffsensei_tpu.core.config import QwenResamplerConfig, VisionEncoderConfig
from diffsensei_tpu.data.download_mangazero import stitch_pages
from diffsensei_tpu.data.eval_dataset import (
    MangaEvalMLLMDataset, MangaEvaluationDataset, MangaInferenceCharImageDataset)
from diffsensei_tpu.models.mllm.qwen_visual import VisionTransformerWithAttnPool
from diffsensei_tpu.serve.examples import example_inputs, example_inputs_wo_mllm

from tests.test_data import _annotations
from tests.test_serve_mllm_data import _spec


def test_evaluation_dataset_items():
    ds = MangaEvaluationDataset(None, "", annotations=_annotations(2),
                                max_num_ips=2, rng=random.Random(0))
    assert len(ds) == 4
    item = ds[0]
    assert item["height"] % 8 == 0 and item["width"] % 8 == 0
    assert len(item["ip_images"]) <= 2
    assert all(isinstance(im, Image.Image) for im in item["ip_images"])
    assert len(item["ip_bbox"]) == len(item["ip_images"])
    # biggest character first: char 2 bbox area > char 1
    assert item["ip_bbox"][0][2] - item["ip_bbox"][0][0] > 0


def test_eval_mllm_dataset_prompt():
    spec = _spec()
    ds = MangaEvalMLLMDataset(None, "", annotations=_annotations(1),
                              max_num_ips=2, mllm_spec=spec,
                              rng=random.Random(0))
    item = ds[0]
    assert item["input_ids"][0, -1] == spec.boi_id
    assert item["ids_cmp_mask"].sum() == spec.num_img_tokens


def test_char_image_inference_dataset(tmp_path):
    Image.new("RGB", (50, 80), (200, 10, 10)).save(tmp_path / "a.png")
    ds = MangaInferenceCharImageDataset(
        [{"caption": "hero", "character_images": ["a.png"],
          "ip_bbox": [[0, 0, 1, 1]], "height": 256, "width": 256}],
        char_image_root=str(tmp_path))
    item = ds[0]
    assert item["ip_images"][0].size == (50, 80)


def test_stitch_pages():
    a = Image.new("RGB", (40, 60), (255, 0, 0))
    b = Image.new("RGB", (30, 80), (0, 255, 0))
    out = stitch_pages(a, b)
    assert out.size == (70, 80)
    arr = np.asarray(out)
    assert (arr[10, 10] == [255, 0, 0]).all()
    assert (arr[10, 50] == [0, 255, 0]).all()


def test_attn_pool_vit():
    cfg = VisionEncoderConfig(image_size=28, patch_size=14, hidden_size=32,
                              num_layers=1, num_heads=2, intermediate_size=64,
                              use_class_embedding=False)
    pool = QwenResamplerConfig(grid_size=2, embed_dim=32, num_heads=2,
                               kv_dim=None)
    model = VisionTransformerWithAttnPool(cfg, pool, output_dim=16)
    x = jnp.ones((2, 28, 28, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 16)
    assert bool(jnp.isfinite(out).all())


def test_example_presets():
    assert len(example_inputs) == 2
    assert len(example_inputs_wo_mllm[0]) == 6


def test_inference_mllm_dataset_page_level_caching():
    """MangaInferenceMLLMDataset: one source crop per character per PAGE —
    frames of the same page reuse the cached bbox; items carry
    condition_ip_bbox + the inference prompt (dataset_mllm_max_ip.py:673-851)."""
    from diffsensei_tpu.data.eval_dataset import MangaInferenceMLLMDataset

    spec = _spec()
    ds = MangaInferenceMLLMDataset(None, "", annotations=_annotations(2),
                                   max_num_ips=2, mllm_spec=spec,
                                   rng=random.Random(0))
    assert len(ds) == 4
    a, b = ds[0], ds[1]          # two frames of page 0
    assert a["ann"] is b["ann"]
    # page-level cache: the same character id maps to the SAME source bbox in
    # both frames' condition_ip_bbox
    cache = ds._page_source_chars[ds._page_key(a["ann"])]
    assert set(map(tuple, a["condition_ip_bbox"])) <= \
        set(map(tuple, cache["char_bboxes"]))
    assert set(map(tuple, b["condition_ip_bbox"])) <= \
        set(map(tuple, cache["char_bboxes"]))
    # repeated access hits the cache (no resampling drift)
    a2 = ds[0]
    assert [tuple(x) for x in a2["condition_ip_bbox"]] == \
        [tuple(x) for x in a["condition_ip_bbox"]]
    # MLLM prompt present with cmp slots and trailing generation trigger
    assert a["input_ids"][0, -1] == spec.boi_id
    assert a["ids_cmp_mask"].sum() == spec.num_img_tokens
    assert len(a["ip_images"]) == len(a["ip_bbox"]) == \
        len(a["condition_ip_bbox"])
    assert a["height"] % 8 == 0 and a["width"] % 8 == 0


def test_char_image_dataset_mllm_variant(tmp_path):
    """MangaInferenceCharImageDataset with an mllm_spec adds the inference
    prompt (MangaInferenceCharImageMLLMDataset, dataset_mllm_max_ip.py:853)."""
    Image.new("RGB", (40, 60), (10, 10, 200)).save(tmp_path / "c.png")
    spec = _spec()
    ds = MangaInferenceCharImageDataset(
        [{"caption": "a duel", "character_images": ["c.png"],
          "ip_bbox": [[0, 0, 1, 1]], "height": 256, "width": 256}],
        char_image_root=str(tmp_path), mllm_spec=spec)
    item = ds[0]
    assert len(item["ip_images"]) == 1
    assert item["input_ids"][0, -1] == spec.boi_id
    assert item["ids_cmp_mask"].sum() == spec.num_img_tokens
