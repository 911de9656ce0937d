"""Evaluation / inference datasets: per-frame items for generation-time eval.

Capability match for ``MangaEvaluationDataset`` (``src/datasets/dataset_size_bucket.py:337-485``)
and the MLLM eval/inference variants (``dataset_mllm_max_ip.py:475,673,853``):
flattened per-frame items carrying everything the pipeline needs to regenerate
the panel — native frame size snapped to the bucket grid (the reference rounds
to a step of 8, ``:441-442``; bucket snapping is the TPU-side recompile bound),
biggest-characters-first selection (``:396``), per-character source crops drawn
from other frames of the page, dialog bboxes, and the raw annotations for
metric computation.

``MangaInferenceCharImageDataset`` draws characters from a directory of
reference images instead of page crops (``dataset_mllm_max_ip.py:853-1007``).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

from PIL import Image

from diffsensei_tpu.core.buckets import snap_to_bucket
from diffsensei_tpu.data import geometry
from diffsensei_tpu.data.mllm_dataset import MLLMTokenSpec, build_inference_prompt


class MangaEvaluationDataset:
    """Per-frame eval items for the wo-MLLM pipeline."""

    def __init__(self, ann_path: Optional[str], image_root: str,
                 max_num_ips: int = 4, max_num_dialogs: int = 8,
                 mask_dialog: bool = False,
                 min_ip_height: int = 0, min_ip_width: int = 0,
                 annotations: Optional[List[Dict]] = None,
                 rng: Optional[random.Random] = None,
                 snap: bool = True):
        if annotations is None:
            with open(ann_path) as f:
                annotations = json.load(f)
        self.annotations = annotations
        self.image_root = image_root
        self.max_num_ips = max_num_ips
        self.max_num_dialogs = max_num_dialogs
        self.mask_dialog = mask_dialog
        self.min_ip_height = min_ip_height
        self.min_ip_width = min_ip_width
        self.rng = rng or random.Random(0)
        self.snap = snap
        self.items: List[Dict] = []
        for ann in self.annotations:
            for frame_idx, _ in enumerate(ann["frames"]):
                self.items.append({"ann": ann, "frame_idx": frame_idx})

    def __len__(self):
        return len(self.items)

    def _support_ids(self, ann):
        support = set()
        for frame in ann["frames"]:
            count: Dict[int, int] = {}
            for char in frame["characters"]:
                count[char["id"]] = count.get(char["id"], 0) + 1
            support.update(cid for cid, c in count.items() if c > 1)
        return support

    def __getitem__(self, idx: int) -> Dict:
        item = self.items[idx]
        ann, frame_idx = item["ann"], item["frame_idx"]
        frame_info = ann["frames"][frame_idx]
        if "image" in ann:
            page_image = ann["image"].convert("RGB")
        else:
            page_image = Image.open(
                os.path.join(self.image_root, ann["image_path"])).convert("RGB")
        if self.mask_dialog:
            page_image = geometry.mask_dialogs_from_image(page_image, ann)

        x1, y1, x2, y2 = frame_info["bbox"]
        height, width = y2 - y1, x2 - x1
        if self.snap:
            height, width = snap_to_bucket(height, width)
        else:
            height, width = (height // 8) * 8, (width // 8) * 8

        # biggest characters first (reference :396); sources from any frame
        support = self._support_ids(ann)
        chars = sorted(frame_info["characters"],
                       key=lambda c: (c["bbox"][2] - c["bbox"][0]) *
                                     (c["bbox"][3] - c["bbox"][1]),
                       reverse=True)
        ip_images, ip_bbox = [], []
        for char in chars:
            if char["id"] in support:
                continue
            sources = []
            for frame in ann["frames"]:
                for src in frame["characters"]:
                    sx1, sy1, sx2, sy2 = src["bbox"]
                    if (src["id"] == char["id"]
                            and (sy2 - sy1) > self.min_ip_height
                            and (sx2 - sx1) > self.min_ip_width
                            and src.get("type", 0) == 0):
                        sources.append(src["bbox"])
            if not sources:
                continue
            ip_images.append(page_image.crop(tuple(self.rng.choice(sources))))
            ip_bbox.append(geometry.get_relative_bbox(frame_info["bbox"],
                                                      char["bbox"]))
            if len(ip_images) >= self.max_num_ips:
                break

        dialog_bbox = [
            geometry.get_relative_bbox(frame_info["bbox"], d["bbox"])
            for d in frame_info.get("dialogs", [])[: self.max_num_dialogs]
        ]
        return {
            "caption": frame_info.get("caption", ""),
            "height": height,
            "width": width,
            "ip_images": ip_images,            # PIL, pipeline preprocesses
            "ip_bbox": ip_bbox,
            "dialog_bbox": dialog_bbox,
            "frame_info": frame_info,
            "ann": ann,
        }


class MangaEvalMLLMDataset(MangaEvaluationDataset):
    """Eval items + the MLLM inference prompt (cmp slots for source chars);
    reference ``dataset_mllm_max_ip.py:673-851``."""

    def __init__(self, *args, mllm_spec: MLLMTokenSpec, **kwargs):
        super().__init__(*args, **kwargs)
        self.mllm_spec = mllm_spec
        self._newline = list(mllm_spec.encode_text("\n"))

    def __getitem__(self, idx: int) -> Dict:
        item = super().__getitem__(idx)
        caption_ids = self.mllm_spec.encode_text(item["caption"])
        item.update(build_inference_prompt(caption_ids, self.mllm_spec,
                                           self._newline))
        return item


class MangaInferenceMLLMDataset(MangaEvalMLLMDataset):
    """Per-frame MLLM inference items with PAGE-LEVEL source-character caching
    (reference ``dataset_mllm_max_ip.py:673-851``): the first frame of a page
    samples ONE source bbox per character id (``sample_source_characters``,
    ``:722-747``) and every later frame of the same page reuses that crop, so
    a character's conditioning image is consistent across the page's panels —
    the property the reference's paper-eval harness relies on.

    Items add ``condition_ip_bbox`` (the source crops' page bboxes) and
    truncate captions to ``max_caption_length`` tokens (``:779-783``).
    """

    def __init__(self, *args, max_caption_length: int = 77, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_caption_length = max_caption_length
        self._page_source_chars: Dict = {}

    def _page_key(self, ann) -> str:
        # fallback key = the annotation's index in self.annotations (stable
        # for the dataset's lifetime; ``id()`` could alias after GC)
        if ann.get("image_path"):
            return ann["image_path"]
        if not hasattr(self, "_ann_index"):
            self._ann_index = {id(a): i for i, a in enumerate(self.annotations)}
        return f"ann-{self._ann_index[id(ann)]}"

    def sample_source_characters(self, ann):
        """One (id → bbox) choice per page, cached (reference ``:722-747``)."""
        key = self._page_key(ann)
        if key in self._page_source_chars:
            cached = self._page_source_chars[key]
            return cached["char_ids"], cached["char_bboxes"]
        char_boxes: Dict = {}
        for frame in ann["frames"]:
            for char in frame["characters"]:
                x1, y1, x2, y2 = char["bbox"]
                if ((y2 - y1) > self.min_ip_height
                        and (x2 - x1) > self.min_ip_width
                        and char.get("type", 0) == 0):
                    char_boxes.setdefault(char["id"], []).append(char["bbox"])
        char_ids = list(char_boxes)
        char_bboxes = [self.rng.choice(b) for b in char_boxes.values()]
        self._page_source_chars[key] = {"char_ids": char_ids,
                                        "char_bboxes": char_bboxes}
        return char_ids, char_bboxes

    def __getitem__(self, idx: int) -> Dict:
        item = self.items[idx]
        ann, frame_idx = item["ann"], item["frame_idx"]
        frame_info = ann["frames"][frame_idx]
        if "image" in ann:
            page_image = ann["image"].convert("RGB")
        else:
            page_image = Image.open(
                os.path.join(self.image_root, ann["image_path"])).convert("RGB")
        if self.mask_dialog:
            page_image = geometry.mask_dialogs_from_image(page_image, ann)

        x1, y1, x2, y2 = frame_info["bbox"]
        height, width = y2 - y1, x2 - x1
        if self.snap:
            height, width = snap_to_bucket(height, width)
        else:
            height, width = (height // 8) * 8, (width // 8) * 8

        source_ids, source_bboxes = self.sample_source_characters(ann)
        # biggest target characters first (reference ``:753``), matched to
        # their page-cached source crop
        chars = sorted(frame_info["characters"],
                       key=lambda c: (c["bbox"][2] - c["bbox"][0]) *
                                     (c["bbox"][3] - c["bbox"][1]),
                       reverse=True)
        ip_images, ip_bbox, condition_ip_bbox = [], [], []
        for char in chars:
            if char["id"] not in source_ids:
                continue
            cx1, cy1, cx2, cy2 = char["bbox"]
            if ((cy2 - cy1) <= self.min_ip_height
                    or (cx2 - cx1) <= self.min_ip_width):
                continue
            src_bbox = source_bboxes[source_ids.index(char["id"])]
            condition_ip_bbox.append(src_bbox)
            ip_images.append(page_image.crop(tuple(src_bbox)))
            ip_bbox.append(geometry.get_relative_bbox(frame_info["bbox"],
                                                      char["bbox"]))
            if len(ip_bbox) >= self.max_num_ips:
                break

        dialogs = frame_info.get("dialogs", [])
        order = list(range(len(dialogs)))
        self.rng.shuffle(order)
        dialog_bbox = [
            geometry.get_relative_bbox(frame_info["bbox"],
                                       dialogs[i]["bbox"])
            for i in order[: self.max_num_dialogs]
        ]

        caption = frame_info.get("caption", "")
        caption_ids = list(
            self.mllm_spec.encode_text(caption))[: self.max_caption_length]
        out = {
            "caption": caption,
            "height": height,
            "width": width,
            "ip_images": ip_images,
            "ip_bbox": ip_bbox,
            "condition_ip_bbox": condition_ip_bbox,
            "dialog_bbox": dialog_bbox,
            "frame_info": frame_info,
            "ann": ann,
        }
        out.update(build_inference_prompt(caption_ids, self.mllm_spec,
                                          self._newline))
        return out


class MangaInferenceCharImageDataset:
    """Characters drawn from a directory of reference images
    (reference ``dataset_mllm_max_ip.py:853-1007``): each item is a prompt +
    up-to-max_num_ips character image files."""

    def __init__(self, prompts: List[Dict], char_image_root: str,
                 max_num_ips: int = 4,
                 mllm_spec: Optional[MLLMTokenSpec] = None,
                 max_caption_length: int = 77):
        # prompts: [{"caption": str, "character_images": [fname, ...],
        #            "ip_bbox": [...], "dialog_bbox": [...],
        #            "height": int, "width": int}]
        self.prompts = prompts
        self.root = char_image_root
        self.max_num_ips = max_num_ips
        self.mllm_spec = mllm_spec
        self.max_caption_length = max_caption_length
        self._newline = (list(mllm_spec.encode_text("\n"))
                         if mllm_spec else [])

    def __len__(self):
        return len(self.prompts)

    def __getitem__(self, idx: int) -> Dict:
        spec = dict(self.prompts[idx])
        images = []
        for name in spec.get("character_images", [])[: self.max_num_ips]:
            images.append(Image.open(os.path.join(self.root, name))
                          .convert("RGB"))
        spec["ip_images"] = images
        if self.mllm_spec is not None:
            # MLLM variant (MangaInferenceCharImageMLLMDataset, reference
            # ``dataset_mllm_max_ip.py:960-1007``): caption-truncated
            # comprehension prompt alongside the image fields
            caption_ids = list(self.mllm_spec.encode_text(
                spec.get("caption", "")))[: self.max_caption_length]
            spec.update(build_inference_prompt(caption_ids, self.mllm_spec,
                                               self._newline))
        return spec
