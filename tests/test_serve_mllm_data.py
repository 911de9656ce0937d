"""Serving API (wo-MLLM + MLLM paths) and MLLM dataset stream tests."""

import random

import jax
import numpy as np
import pytest
from PIL import Image

from diffsensei_tpu.core.config import AgentConfig, LlamaConfig, QwenResamplerConfig
from diffsensei_tpu.data.bucket_dataset import BucketDatasetConfig
from diffsensei_tpu.data.mllm_dataset import (
    MLLMTokenSpec, MangaTrainMLLMDataset, build_inference_prompt,
    build_mllm_token_stream, relative_bbox_to_loc_tokens)
from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM
from diffsensei_tpu.pipelines.pipeline import DiffSenseiPipeline, PipelineModules
from diffsensei_tpu.serve.api import DiffSenseiServer, GenerationRequest
from diffsensei_tpu.serve.gradio_demo import (
    normalize_points_to_bboxes, parse_bbox_text)

from tests.test_data import _annotations, _tok  # synthetic pages


def _spec(vocab=512, n_img=4):
    ladder = list(range(vocab - n_img - 2, vocab))
    return MLLMTokenSpec(
        bos_id=1, eos_id=2, pad_id=0,
        boi_id=ladder[0], eoi_id=ladder[-1], img_ids=ladder[1:-1],
        encode_text=lambda s: [(ord(c) % 200) + 10 for c in s])


def test_mllm_token_stream_masks():
    spec = _spec()
    stream = build_mllm_token_stream([50, 51, 52], spec, newline_ids=[9],
                                     max_token_length=40)
    ids = stream["mllm_input_ids"]
    labels = stream["mllm_labels"]
    n = spec.num_img_tokens
    assert ids.shape == (40,)
    assert ids[0] == spec.bos_id
    # two image blocks present
    assert (ids == spec.boi_id).sum() == 2
    assert stream["ids_cmp_mask"].sum() == n
    assert stream["ids_gen_mask"].sum() == n
    # cmp slots are inside the first block, gen inside the second
    first_boi, second_boi = np.where(ids == spec.boi_id)[0]
    assert stream["ids_cmp_mask"][first_boi + 1: first_boi + 1 + n].all()
    assert stream["ids_gen_mask"][second_boi + 1: second_boi + 1 + n].all()
    # instruction + gen slots are -100; response boi/eoi supervised
    assert (labels[: first_boi + n + 2] == -100).all()
    assert labels[second_boi] == spec.boi_id
    assert (labels[stream["ids_gen_mask"]] == -100).all()
    # pad region
    assert (ids[-3:] == spec.pad_id).all()
    assert (labels[-3:] == -100).all()


def test_mllm_stream_truncates_long_caption():
    spec = _spec()
    stream = build_mllm_token_stream(list(range(10, 300)), spec, [9], 40)
    assert stream is not None
    assert stream["mllm_input_ids"].shape == (40,)
    assert stream["ids_gen_mask"].sum() == spec.num_img_tokens


def test_loc_tokens():
    s = relative_bbox_to_loc_tokens([0.0, 0.5, 1.0, 0.999])
    assert s.startswith("<box_start><loc-0><loc-112><loc-223>")


def test_mllm_dataset_sample():
    spec = _spec()
    cfg = BucketDatasetConfig(max_num_ips=2, max_num_ip_sources=1,
                              max_num_dialogs=3, batch_size=4)
    ds = MangaTrainMLLMDataset(
        ann_path=None, image_root="", tokenize=_tok, config=cfg,
        annotations=_annotations(1), rng=random.Random(0),
        mllm_spec=spec, max_token_length=64)
    s = ds.get_sample(ds.bucket_keys[0], 0)
    assert s["target_ip_pixel_values"].shape == (2, 224, 224, 3)
    assert s["mllm_input_ids"].shape == (64,)
    assert s["embeds_cmp_mask"].tolist() == [True, False]
    assert s["embeds_gen_mask"].tolist() == [False, True]


def test_inference_prompt_ends_with_boi():
    spec = _spec()
    p = build_inference_prompt([30, 31], spec, [9])
    assert p["input_ids"][0, -1] == spec.boi_id
    assert p["ids_cmp_mask"].sum() == spec.num_img_tokens


# -- serving -------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_server():
    modules = PipelineModules.tiny(jax.random.key(0))
    return DiffSenseiServer(DiffSenseiPipeline(modules))


def _prompt_ids(vocab=256):
    rng = np.random.default_rng(0)
    mk = lambda: jax.numpy.asarray(rng.integers(1, vocab - 1, (1, 77)),
                                   jax.numpy.int32)
    return dict(ids=mk(), neg_ids=mk(), ids_2=mk(), neg_ids_2=mk())


def test_server_wo_mllm(tiny_server):
    req = GenerationRequest(
        height=64, width=64, num_inference_steps=2, seed=3,
        character_images=[Image.new("RGB", (100, 150), (90, 80, 70))],
        ip_bbox=[[0.0, 0.0, 1.0, 1.0]],
        dialog_bbox=[[0.1, 0.1, 0.4, 0.3]],
        prompt_ids=_prompt_ids())
    # snap applies: 64x64 -> bucket (128,128)
    imgs = tiny_server.generate(req)
    assert imgs.shape[0] == 1 and imgs.shape[-1] == 3
    assert np.isfinite(imgs).all()
    pils = tiny_server.generate_pil(req)
    assert isinstance(pils[0], Image.Image)


def test_server_with_mllm_agent():
    modules = PipelineModules.tiny(jax.random.key(0))
    manga = modules.manga
    iv = manga.num_ip_tokens
    llm = LlamaConfig.tiny()
    cross = modules.unet.config.cross_attention_dim
    acfg = AgentConfig(
        llm=llm,
        input_resampler=QwenResamplerConfig(
            grid_size=2, num_queries_override=iv,
            embed_dim=llm.hidden_size, num_heads=4, kv_dim=cross),
        output_resampler=QwenResamplerConfig(
            grid_size=2, num_queries_override=iv,
            embed_dim=cross, num_heads=4, kv_dim=llm.hidden_size),
    )
    agent = ContinuousLVLM.build(acfg, jax.random.key(9))
    spec = _spec(vocab=llm.vocab_size, n_img=iv)
    server = DiffSenseiServer(DiffSenseiPipeline(modules), agent=agent,
                              mllm_spec=spec, mllm_max_new_tokens=iv + 4)
    req = GenerationRequest(
        prompt="two characters", height=64, width=64, num_inference_steps=1,
        character_images=[Image.new("RGB", (64, 64), (10, 20, 30))],
        ip_bbox=[[0.0, 0.0, 0.5, 1.0]],
        prompt_ids=_prompt_ids())
    imgs = server.generate(req)
    assert np.isfinite(imgs).all()


def test_bbox_parsing_helpers():
    assert parse_bbox_text("0.1, 0.2, 0.5, 0.6\nbad line\n0,0,1,1") == \
        [[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 1.0, 1.0]]
    assert parse_bbox_text("") == []
    assert normalize_points_to_bboxes([], 100, 100) == []
    assert normalize_points_to_bboxes([[10, 20, 2, 50, 60, 3]], 100, 100) == \
        [[0.1, 0.2, 0.5, 0.6]]


def test_canvas_to_bboxes():
    from diffsensei_tpu.serve.gradio_demo import blank_canvas, canvas_to_bboxes

    assert canvas_to_bboxes(None) == []
    canvas = blank_canvas(200, 100)      # 100 wide x 200 high
    assert canvas_to_bboxes(canvas) == []        # no points drawn
    canvas["points"] = [[10, 40, 2, 60, 100, 3],   # one drawn box
                        [90, 180, 2, 50, 120, 3]]  # reversed corners ok
    got = canvas_to_bboxes(canvas)
    assert got == [[0.1, 0.2, 0.6, 0.5], [0.5, 0.6, 0.9, 0.9]]
    # numpy-image canvases (gradio may hand back arrays) use [H, W] dims
    import numpy as _np
    arr_canvas = {"image": _np.zeros((200, 100, 3), _np.uint8),
                  "points": [[10, 40, 2, 60, 100, 3]]}
    assert canvas_to_bboxes(arr_canvas) == [[0.1, 0.2, 0.6, 0.5]]


def test_server_warmup_precompiles(tiny_server):
    """warmup() drives the conditioned pipeline for each size without error
    (compiling the (bucket, steps) programs a production server will hit)."""
    tiny_server.warmup([(64, 64), (128, 96)], num_inference_steps=2)
    # a subsequent request at a warmed size still produces a valid panel
    req = GenerationRequest(height=64, width=64, num_inference_steps=2,
                            seed=1, prompt_ids=_prompt_ids())
    imgs = tiny_server.generate(req)
    assert imgs.ndim == 4 and np.isfinite(imgs).all()
