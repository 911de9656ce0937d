"""MangaZero bucketed training dataset + batch iterator.

Capability match for ``MangaTrainSizeBucketDataset`` + ``BucketBatchSampler`` +
``collate_fn`` (``src/datasets/dataset_size_bucket.py:23,488,303``) with two
TPU-driven changes:

* **Fixed shapes per bucket, no pseudo-samples.** The reference pads every
  batch with ``None`` pseudo-samples to the global batch size and filters them
  in collate ("Accelerate cannot handle varying batch sizes", ``:532-535``) —
  so real per-step batch size varies, which would mean unbounded XLA
  recompiles. Here every bucket's batch has a FIXED size (the per-class scaled
  size, ``batch_size / 4^size_index``, same formula as ``:503``) and partial
  final batches are padded with repeated samples + a ``sample_mask`` the train
  step uses to mask the loss. Compilation keys = (bucket_hw, bucket_batch) —
  one per bucket class, bounded.
* **NHWC numpy out**, no torch.

Annotation schema (MangaZero, observed in ``partition_data`` ``:78-92`` and
``__getitem__`` ``:208-298``): a JSON list of pages, each
``{"image_path": str, "frames": [{"bbox": [x1,y1,x2,y2], "caption": str,
"characters": [{"id": int, "bbox": [...], "type": 0|1}],
"dialogs": [{"bbox": [...]}]}]}``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from diffsensei_tpu.core.buckets import SIZE_BUCKETS, get_bucket_size
from diffsensei_tpu.data import geometry, processors


@dataclasses.dataclass
class BucketDatasetConfig:
    t_drop_rate: float = 0.05        # caption CFG dropout
    i_drop_rate: float = 0.05        # per-character dropout
    c_drop_rate: float = 0.05        # context-image dropout
    max_num_ips: int = 4
    max_num_ip_sources: int = 1
    max_num_dialogs: int = 8
    mask_dialog: bool = False
    load_context_image: bool = False
    ip_self_condition_rate: float = 0.5
    ip_flip_rate: float = 0.5
    min_ip_height: int = 5
    min_ip_width: int = 5
    batch_size: int = 8              # PER-DEVICE base (reference semantics);
    #                                  smallest size class scales down 4x/class
    data_parallel: int = 1           # mesh data-axis size; global batch =
    #                                  per-bucket size * data_parallel


class MangaTrainSizeBucketDataset:
    """Page-level annotations → per-frame samples partitioned into buckets."""

    def __init__(self, ann_path: str, image_root: str,
                 tokenize: Callable[[str], np.ndarray],
                 tokenize_2: Optional[Callable[[str], np.ndarray]] = None,
                 config: BucketDatasetConfig = BucketDatasetConfig(),
                 size_buckets=None,
                 annotations: Optional[List[Dict]] = None,
                 rng: Optional[random.Random] = None):
        if annotations is None:
            with open(ann_path) as f:
                annotations = json.load(f)
        self.annotations = annotations
        self.image_root = image_root
        self.size_buckets = size_buckets or SIZE_BUCKETS
        self.tokenize = tokenize
        self.tokenize_2 = tokenize_2 or tokenize
        self.cfg = config
        self.rng = rng or random.Random()

        self.buckets: Dict[Tuple[int, int], List[Dict]] = {}
        self.bucket_size_index: Dict[Tuple[int, int], int] = {}
        self._partition()
        self.bucket_keys = list(self.buckets.keys())

    # -- partition (reference :78-92) ----------------------------------------
    def _partition(self):
        for ann_idx, ann in enumerate(self.annotations):
            for frame_idx, frame in enumerate(ann["frames"]):
                w = frame["bbox"][2] - frame["bbox"][0]
                h = frame["bbox"][3] - frame["bbox"][1]
                bh, bw, size_idx = get_bucket_size(h, w, self.size_buckets)
                key = (bh, bw)
                self.buckets.setdefault(key, []).append(
                    {"ann_idx": ann_idx, "frame_idx": frame_idx})
                self.bucket_size_index[key] = size_idx

    def __len__(self):
        return sum(len(v) for v in self.buckets.values())

    # -- character sampling (reference :94-137) --------------------------------
    def _support_ip_ids(self, ann) -> List[int]:
        """Character ids that appear more than once within any single frame
        (ambiguous identity — excluded from conditioning, reference :96-114)."""
        support = set()
        for frame in ann["frames"]:
            count: Dict[int, int] = {}
            for char in frame["characters"]:
                count[char["id"]] = count.get(char["id"], 0) + 1
            support.update(cid for cid, c in count.items() if c > 1)
        return list(support)

    def _sample_condition_characters(self, frame_info, support_ids, rng=None):
        cfg = self.cfg
        rng = rng or self.rng
        ids, bbox, page_bbox = [], [], []
        frame_bbox = frame_info["bbox"]
        for idx in rng.sample(range(len(frame_info["characters"])),
                              len(frame_info["characters"])):
            char = frame_info["characters"][idx]
            if char["id"] in support_ids or rng.random() < cfg.i_drop_rate:
                continue
            ids.append(char["id"])
            bbox.append(geometry.get_relative_bbox(frame_bbox, char["bbox"]))
            page_bbox.append(char["bbox"])
            if len(ids) >= cfg.max_num_ips:
                break
        while len(ids) < cfg.max_num_ips:
            ids.append(-1)
            bbox.append([0.0, 0.0, 0.0, 0.0])
        return ids, bbox, page_bbox

    def _load_ip_images(self, ann, ids, page_bbox, page_image, rng=None):
        """Per character: pick ≤max_sources crops from any frame of the page
        (self-condition vs cross-frame via ip_self_condition_rate, reference
        :139-204), random h-flip, CLIP+Magi preprocess; black-image padding."""
        cfg = self.cfg
        rng = rng or self.rng
        boxes, exists = [], []
        for i, cid in enumerate(ids):
            if cid == -1:
                exists += [0] * cfg.max_num_ip_sources
                boxes += [None] * cfg.max_num_ip_sources
                continue
            id_boxes = []
            if rng.random() < cfg.ip_self_condition_rate and i < len(page_bbox):
                x1, y1, x2, y2 = page_bbox[i]
                if (y2 - y1) > cfg.min_ip_height and (x2 - x1) > cfg.min_ip_width:
                    id_boxes = [page_bbox[i]]
            candidates = []
            for frame in ann["frames"]:
                for char in frame["characters"]:
                    x1, y1, x2, y2 = char["bbox"]
                    if (char["id"] == cid and (y2 - y1) > cfg.min_ip_height
                            and (x2 - x1) > cfg.min_ip_width
                            and char.get("type", 0) == 0):
                        candidates.append(char["bbox"])
            take = min(cfg.max_num_ip_sources - len(id_boxes), len(candidates))
            id_boxes += rng.sample(candidates, take)
            exists += [1] * len(id_boxes)
            exists += [0] * (cfg.max_num_ip_sources - len(id_boxes))
            boxes += id_boxes + [None] * (cfg.max_num_ip_sources - len(id_boxes))

        clip_imgs, magi_imgs = [], []
        for flag, box in zip(exists, boxes):
            if flag:
                crop = page_image.crop(tuple(box))
                crop = geometry.maybe_flip(crop,
                                           rng.random() < cfg.ip_flip_rate)
            else:
                crop = Image.new("RGB", (224, 224), (0, 0, 0))
            clip_imgs.append(processors.clip_preprocess(crop))
            magi_imgs.append(processors.vit_preprocess(crop))
        n = cfg.max_num_ips
        s = cfg.max_num_ip_sources
        return (np.stack(clip_imgs).reshape(n, s, 224, 224, 3),
                np.stack(magi_imgs).reshape(n, s, 224, 224, 3),
                np.asarray(exists, np.float32).reshape(n, s))

    # -- sample build (reference :210-298) -------------------------------------
    def get_sample(self, bucket_key: Tuple[int, int], sample_idx: int,
                   rng: Optional[random.Random] = None) -> Dict:
        """``rng``: per-sample generator — ``batches()`` supplies one derived
        from (epoch seed, bucket, index) so augmentation draws are identical
        whether samples are built serially or on the worker pool (a shared
        ``self.rng`` under a thread pool interleaves nondeterministically)."""
        cfg = self.cfg
        rng = rng or self.rng
        bh, bw = bucket_key
        entry = self.buckets[bucket_key][sample_idx]
        ann = self.annotations[entry["ann_idx"]]
        frame_info = ann["frames"][entry["frame_idx"]]
        x1, y1, x2, y2 = frame_info["bbox"]

        if "image" in ann:          # tests inject PIL images directly
            page_image = ann["image"].convert("RGB")
        else:
            page_image = Image.open(
                os.path.join(self.image_root, ann["image_path"])).convert("RGB")
        if cfg.mask_dialog:
            page_image = geometry.mask_dialogs_from_image(page_image, ann)
        panel = page_image.crop((x1, y1, x2, y2))
        panel, crop_tl = geometry.resize_and_center_crop(panel, (bh, bw))
        pixel_values = processors.panel_transform(panel)

        caption = "" if rng.random() < cfg.t_drop_rate \
            else frame_info.get("caption", "")
        ids_1 = np.asarray(self.tokenize(caption), np.int32).reshape(-1)
        ids_2 = np.asarray(self.tokenize_2(caption), np.int32).reshape(-1)

        support = self._support_ip_ids(ann)
        char_ids, ip_bbox, page_bbox = self._sample_condition_characters(
            frame_info, support, rng)
        clip_imgs, magi_imgs, ip_exists = self._load_ip_images(
            ann, char_ids, page_bbox, page_image, rng)

        # context image: a random OTHER frame of the page, CLIP-preprocessed,
        # with c_drop_rate dropout to a black image (reference
        # dataset_size_bucket.py:264-272, enabled via train.py:256)
        context = None
        if cfg.load_context_image:
            frames = ann["frames"]
            if len(frames) > 1 and rng.random() >= cfg.c_drop_rate:
                others = (frames[: entry["frame_idx"]]
                          + frames[entry["frame_idx"] + 1:])
                cx1, cy1, cx2, cy2 = rng.choice(others)["bbox"]
                context_img = page_image.crop((cx1, cy1, cx2, cy2))
                drop_context = 0.0
            else:
                context_img = Image.new("RGB", (224, 224), (0, 0, 0))
                drop_context = 1.0
            context = (processors.clip_preprocess(context_img),
                       np.asarray(drop_context, np.float32))

        dialogs = frame_info.get("dialogs", [])
        dialog_bbox = []
        for idx in rng.sample(range(len(dialogs)), len(dialogs)):
            dialog_bbox.append(geometry.get_relative_bbox(
                frame_info["bbox"], dialogs[idx]["bbox"]))
            if len(dialog_bbox) >= cfg.max_num_dialogs:
                break
        while len(dialog_bbox) < cfg.max_num_dialogs:
            dialog_bbox.append([0.0, 0.0, 0.0, 0.0])

        sample = {
            "pixel_values": pixel_values.astype(np.float32),
            "text_input_ids": ids_1,
            "text_input_ids_2": ids_2,
            "ip_pixel_values": clip_imgs,
            "magi_pixel_values": magi_imgs,
            "ip_exists": ip_exists,
            "ip_bbox": np.asarray(ip_bbox, np.float32),
            "dialog_bbox": np.asarray(dialog_bbox, np.float32),
            "original_size": np.asarray([y2 - y1, x2 - x1], np.float32),
            "crop_coords_top_left": np.asarray(crop_tl, np.float32),
            "target_size": np.asarray([bh, bw], np.float32),
        }
        if context is not None:
            sample["context_pixel_values"], sample["drop_context"] = context
        return sample

    # -- batching (reference BucketBatchSampler :488-544) ----------------------
    def bucket_batch_size(self, bucket_key) -> int:
        """per-device base / 4^size_index (reference formula at :503), times
        the mesh data-axis size so every batch shards evenly."""
        idx = self.bucket_size_index[bucket_key]
        per_device = max(1, round(self.cfg.batch_size / (2 ** (idx * 2))))
        return per_device * self.cfg.data_parallel

    def batches(self, shuffle: bool = True,
                seed: Optional[int] = None,
                num_workers: int = 0,
                host_id: int = 0,
                num_hosts: int = 1) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of fixed-shape numpy batches with ``sample_mask``.

        ``num_workers > 0`` builds each batch's samples on a thread pool (PIL
        decode/resize releases the GIL — the reference's ``8*num_processes``
        DataLoader workers, ``scripts/train/train.py:236-237``). Augmentation
        draws come from a per-sample ``Random(epoch seed, bucket, index)``, so
        the stream is bit-identical for any worker count — parallel loading
        never costs exact-resume reproducibility.

        Multi-host: every host iterates the SAME epoch plan (same seed) and
        takes rows ``[host_id::num_hosts]`` of each global batch, so the
        concatenation across hosts is the full global batch (the per-rank
        sampler sharding Accelerate does for the reference).
        """
        if num_hosts > 1 and any(
                self.bucket_batch_size(k) % num_hosts for k in self.bucket_keys):
            raise ValueError(
                f"bucket batch sizes must be divisible by num_hosts="
                f"{num_hosts} (got {[self.bucket_batch_size(k) for k in self.bucket_keys]})")
        rng = random.Random(seed)
        seed_base = seed if seed is not None else rng.randrange(2 ** 31)

        def sample_rng(key: Tuple[int, int], idx: int) -> random.Random:
            # deterministic in (epoch seed, bucket, sample index); int-only
            # arithmetic so it is stable across processes/PYTHONHASHSEED
            return random.Random(
                ((seed_base * 1_000_003 + key[0]) * 8_191 + key[1])
                * 1_000_003 + idx)
        plan: List[Tuple[Tuple[int, int], List[int]]] = []
        for key in self.bucket_keys:
            order = list(range(len(self.buckets[key])))
            if shuffle:
                rng.shuffle(order)
            bs = self.bucket_batch_size(key)
            for i in range(0, len(order), bs):
                plan.append((key, order[i:i + bs]))
        if shuffle:
            rng.shuffle(plan)

        pool = None
        if num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            for key, idxs in plan:
                bs = self.bucket_batch_size(key)
                mask = np.zeros((bs,), np.float32)
                mask[: len(idxs)] = 1.0
                # pad partial batches by repeating samples (loss-masked)
                padded = idxs + [idxs[i % len(idxs)]
                                 for i in range(bs - len(idxs))]
                local = padded[host_id::num_hosts]
                local_mask = mask[host_id::num_hosts]
                if pool is not None:
                    samples = list(pool.map(
                        lambda i: self.get_sample(key, i, sample_rng(key, i)),
                        local))
                else:
                    samples = [self.get_sample(key, i, sample_rng(key, i))
                               for i in local]
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                batch["sample_mask"] = local_mask
                yield batch
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
