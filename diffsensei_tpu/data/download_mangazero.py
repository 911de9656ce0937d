"""MangaZero page-image acquisition.

Capability match for ``scripts/dataset/download_mangazero.py:10-66``: for every
annotation, fetch ``meta.url1`` / ``meta.url2`` from MangaDex, stitch the two
page halves horizontally, save as JPEG under the annotation's ``image_path``.

Fixes the reference's latent bugs: error counters are initialized before use
(``download_mangazero.py:28-29`` increments undefined names), and failures are
tallied + returned instead of crashing. Network access is gated — in offline
environments this module imports fine and ``main`` reports a clear error.

Usage:
  python -m diffsensei_tpu.data.download_mangazero \
      --ann_path annotations.json --output_image_root images/
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from typing import Dict, Optional

from PIL import Image


def _fetch(url: str, timeout: float = 30.0) -> Optional[Image.Image]:
    try:
        import requests
    except ImportError as e:
        raise RuntimeError("requests is not installed; download requires "
                           "network-enabled environment") from e
    try:
        response = requests.get(url, timeout=timeout)
        response.raise_for_status()
        return Image.open(io.BytesIO(response.content)).convert("RGB")
    except Exception as e:  # noqa: BLE001 - any fetch failure skips the page
        print(f"error downloading {url}: {e}; skipping")
        return None


def stitch_pages(img1: Image.Image, img2: Image.Image) -> Image.Image:
    """Horizontal stitch of the two page halves (reference :44-51)."""
    total_width = img1.width + img2.width
    max_height = max(img1.height, img2.height)
    out = Image.new("RGB", (total_width, max_height))
    out.paste(img1, (0, 0))
    out.paste(img2, (img1.width, 0))
    return out


def download(ann_path: str, output_image_root: str,
             sleep_s: float = 0.2) -> Dict[str, int]:
    with open(ann_path, encoding="utf-8") as f:
        annotations = json.load(f)
    stats = {"total": len(annotations), "saved": 0, "skipped": 0,
             "fetch_errors": 0}
    for idx, ann in enumerate(annotations):
        meta = ann["meta"]
        img1 = _fetch(meta["url1"])
        time.sleep(sleep_s)
        img2 = _fetch(meta["url2"])
        time.sleep(sleep_s)
        stats["fetch_errors"] += (img1 is None) + (img2 is None)
        if img1 is None or img2 is None:
            stats["skipped"] += 1
            print(f"skipped {ann['image_path']} ({idx + 1}/{stats['total']})")
            continue
        save_path = os.path.join(output_image_root, ann["image_path"])
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        stitch_pages(img1, img2).save(save_path, "JPEG")
        stats["saved"] += 1
        print(f"saved {ann['image_path']} ({idx + 1}/{stats['total']})")
    print(f"done: {stats}")
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ann_path", required=True)
    parser.add_argument("--output_image_root", required=True)
    args = parser.parse_args(argv)
    download(args.ann_path, args.output_image_root)


if __name__ == "__main__":
    main()
