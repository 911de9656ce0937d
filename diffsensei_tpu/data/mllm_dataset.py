"""MLLM (stage-3) dataset: bucket samples + SEED-X supervision streams.

Capability match for ``MangaTrainMLLMDataset`` (``src/datasets/dataset_mllm_max_ip.py:31-420``):
on top of the stage-2 bucket sample it adds

* **target character crops** — the panel's own characters (black-padded to
  ``max_num_ips``), whose embeddings are the agent's reconstruction target;
* the **MLLM token stream**: ``bos ‖ caption \\n <img><img_0>…<img_{n-1}></img> \\n
  ‖ <img>…</img> ‖ eos`` with labels −100 over the instruction, the FIRST image
  block marked ``ids_cmp_mask`` (comprehension slots) and the LAST marked
  ``ids_gen_mask`` (generation slots, labels −100 inside), padded to
  ``max_token_length`` (``:322-393``);
* ``embeds_cmp_mask=[T,F]`` / ``embeds_gen_mask=[F,T]`` pairing the source
  char block with the target block (``:354-355``).

Overlong samples are dropped at partition-sampling time (the reference emits a
pseudo-sample, ``:361-368``); with a fixed prompt template the length is a
static function of the caption, so we truncate the caption instead — no sample
loss, same stream shape.

``relative_bbox_to_loc_tokens`` serializes a bbox into ``<loc-k>`` tokens — in
the reference this helper exists but the final prompt format doesn't use it
(``:233-246``); kept for parity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from diffsensei_tpu.data import processors
from diffsensei_tpu.data.bucket_dataset import (
    BucketDatasetConfig, MangaTrainSizeBucketDataset)

BOI_TOKEN = "<img>"
EOI_TOKEN = "</img>"
IMG_TOKEN = "<img_{:05d}>"
NUM_LOC_TOKENS = 224


@dataclasses.dataclass(frozen=True)
class MLLMTokenSpec:
    """Tokenizer-derived id constants + a plain-text encoder."""

    bos_id: int
    eos_id: int
    pad_id: int
    boi_id: int
    eoi_id: int
    img_ids: Sequence[int]            # num_img_tokens ladder ids
    encode_text: Callable[[str], List[int]]   # no special tokens

    @property
    def num_img_tokens(self) -> int:
        return len(self.img_ids)

    @property
    def ladder_ids(self) -> np.ndarray:
        """[boi, img_0.., eoi] — the generation forcing table."""
        return np.asarray([self.boi_id, *self.img_ids, self.eoi_id], np.int64)


def relative_bbox_to_loc_tokens(rel_bbox: Sequence[float],
                                num_loc_tokens: int = NUM_LOC_TOKENS) -> str:
    """``<box_start><loc-k>...<box_end>`` serialization (reference ``:233-246``)."""
    quant = [min(num_loc_tokens - 1, max(0, int(v * num_loc_tokens)))
             for v in rel_bbox]
    locs = "".join(f"<loc-{k}>" for k in quant)
    return f"<box_start>{locs}<box_end>"


def build_mllm_token_stream(caption_ids: List[int], spec: MLLMTokenSpec,
                            newline_ids: List[int],
                            max_token_length: int) -> Optional[Dict[str, np.ndarray]]:
    """Assemble the supervised stream; None if it cannot fit."""
    n = spec.num_img_tokens
    block = [spec.boi_id, *spec.img_ids, spec.eoi_id]
    overhead = 2 + 2 * len(block) + 2 * len(newline_ids)  # bos/eos + blocks + \n
    budget = max_token_length - overhead
    if budget < 0:
        return None
    caption_ids = list(caption_ids)[:budget]

    instruction = caption_ids + newline_ids + block + newline_ids
    response = list(block)
    input_ids = [spec.bos_id] + instruction + response + [spec.eos_id]
    labels = [-100] * (1 + len(instruction)) + response + [spec.eos_id]

    L = max_token_length
    pad = L - len(input_ids)
    attention_mask = [1] * len(input_ids) + [0] * pad
    input_ids = input_ids + [spec.pad_id] * pad
    labels = labels + [-100] * pad

    ids_cmp = np.zeros((L,), bool)
    ids_gen = np.zeros((L,), bool)
    first_block = 1 + len(caption_ids) + len(newline_ids)
    ids_cmp[first_block + 1: first_block + 1 + n] = True
    last_block = 1 + len(instruction)
    ids_gen[last_block + 1: last_block + 1 + n] = True
    labels = np.asarray(labels, np.int32)
    labels[last_block + 1: last_block + 1 + n] = -100   # rec slots not LM-supervised

    return {
        "mllm_input_ids": np.asarray(input_ids, np.int32),
        "mllm_attention_mask": np.asarray(attention_mask, np.int32),
        "mllm_labels": labels,
        "ids_cmp_mask": ids_cmp,
        "ids_gen_mask": ids_gen,
        "embeds_cmp_mask": np.asarray([True, False]),
        "embeds_gen_mask": np.asarray([False, True]),
    }


class MangaTrainMLLMDataset(MangaTrainSizeBucketDataset):
    def __init__(self, *args, mllm_spec: MLLMTokenSpec,
                 max_token_length: int = 400, **kwargs):
        super().__init__(*args, **kwargs)
        self.mllm_spec = mllm_spec
        self.max_token_length = max_token_length
        self._newline_ids = list(mllm_spec.encode_text("\n"))

    def _load_target_ip_images(self, frame_info, page_bbox, page_image):
        """Crops of the panel's own characters (reconstruction targets),
        black-padded to max_num_ips (reference ``:158-231``)."""
        cfg = self.cfg
        clips, magis = [], []
        for k in range(cfg.max_num_ips):
            if k < len(page_bbox):
                crop = page_image.crop(tuple(page_bbox[k]))
            else:
                crop = Image.new("RGB", (224, 224), (0, 0, 0))
            clips.append(processors.clip_preprocess(crop))
            magis.append(processors.vit_preprocess(crop))
        return np.stack(clips), np.stack(magis)

    def get_sample(self, bucket_key, sample_idx, rng=None):
        sample = super().get_sample(bucket_key, sample_idx, rng)
        rng = rng or self.rng
        entry = self.buckets[bucket_key][sample_idx]
        ann = self.annotations[entry["ann_idx"]]
        frame_info = ann["frames"][entry["frame_idx"]]

        if "image" in ann:
            page_image = ann["image"].convert("RGB")
        else:
            import os
            page_image = Image.open(
                os.path.join(self.image_root, ann["image_path"])).convert("RGB")
        _, _, page_bbox = self._sample_condition_characters(
            frame_info, self._support_ip_ids(ann), rng)
        tclip, tmagi = self._load_target_ip_images(frame_info, page_bbox,
                                                   page_image)
        sample["target_ip_pixel_values"] = tclip
        sample["target_magi_pixel_values"] = tmagi

        caption_ids = self.mllm_spec.encode_text(
            frame_info.get("caption", ""))
        stream = build_mllm_token_stream(caption_ids, self.mllm_spec,
                                         self._newline_ids,
                                         self.max_token_length)
        assert stream is not None, "max_token_length too small for template"
        sample.update(stream)
        return sample


def build_inference_prompt(caption_ids: List[int], spec: MLLMTokenSpec,
                           newline_ids: List[int]) -> Dict[str, np.ndarray]:
    """Serving prompt (reference ``scripts/demo/gradio.py:36-57``):
    ``bos ‖ caption \\n <img><img_0..n></img> \\n <img>`` — the comprehension
    block carries the source characters; the trailing ``<img>`` triggers the
    forced generation ladder."""
    block = [spec.boi_id, *spec.img_ids, spec.eoi_id]
    ids = [spec.bos_id] + list(caption_ids) + newline_ids + block \
        + newline_ids + [spec.boi_id]
    ids = np.asarray(ids, np.int32)
    cmp_mask = np.zeros(ids.shape, bool)
    start = 1 + len(caption_ids) + len(newline_ids) + 1
    cmp_mask[start: start + spec.num_img_tokens] = True
    return {"input_ids": ids[None], "ids_cmp_mask": cmp_mask[None]}
