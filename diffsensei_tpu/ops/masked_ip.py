"""Spatially masked IP-Adapter conditioning ops.

Semantics replicate ``src/models/attention_processor.py:115-169`` (mask construction)
and ``src/models/unet.py:88-114`` (dialog-bbox rasterization) from the reference —
but vectorized and hoisted:

* The reference rebuilds the IP attention mask with a per-(batch, character) Python
  loop inside **every** cross-attention layer on **every** denoising step
  (``attention_processor.py:243``). The mask depends only on (bbox, h, w), and bboxes
  are fixed across the denoise loop, so the TPU build computes one bias per UNet
  resolution level per pipeline call and reuses it everywhere.
* The reference rasterizes dialog bboxes with a per-(batch, dialog) Python loop each
  step (``unet.py:100-110``); here it is a single vectorized grid test.

Reference mask semantics preserved exactly (verified against a NumPy oracle in
``tests/test_masked_ip.py``):

* pixel grid is ``linspace(0, 1, w) x linspace(0, 1, h)`` — normalized so the last
  pixel sits at exactly 1.0;
* a query position can attend to character i's token block iff it lies inside
  character i's bbox, bounds **inclusive**;
* the ``num_dummy_tokens`` "dummy" columns get the complement: attendable only
  where **no** character bbox covers the pixel;
* each character contributes ``num_vision_tokens`` contiguous key columns
  (reference ``repeat_interleave``), laid out ``[dummy block ‖ char 0 ‖ … ‖ char I-1]``;
* masked-out entries get additive bias -10000.0 (not -inf), matching reference
  numerics under CFG where the uncond half has all-zero bboxes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

MASK_VALUE = -10000.0


def seq_len_to_hw(sequence_length: int, aspect_ratio: float) -> Tuple[int, int]:
    """Recover (height, width) from a flattened spatial length and h/w ratio.

    Integer-search semantics of ``attention_processor.py:131-139``. The TPU UNet
    threads static (h, w) instead of re-deriving them per layer; this function
    exists for API parity and for validating that threading matches the reference.
    """
    width = int((sequence_length / aspect_ratio) ** 0.5)
    height = sequence_length // max(width, 1)
    while width * height != sequence_length:
        if width * height < sequence_length:
            width += 1
        else:
            width -= 1
        height = sequence_length // width
    return height, width


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Flattened normalized pixel coordinates, row-major (y outer, x inner)."""
    x = jnp.linspace(0.0, 1.0, width, dtype=dtype)
    y = jnp.linspace(0.0, 1.0, height, dtype=dtype)
    xg = jnp.tile(x[None, :], (height, 1)).reshape(-1)
    yg = jnp.tile(y[:, None], (1, width)).reshape(-1)
    return xg, yg


def build_ip_attention_bias(
    bbox: jnp.ndarray,
    height: int,
    width: int,
    num_vision_tokens: int,
    num_dummy_tokens: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Additive attention bias for masked IP cross-attention.

    Args:
      bbox: ``[batch, max_num_ips, 4]`` relative [x1, y1, x2, y2] in [0, 1].
      height/width: static spatial dims of the feature map at this UNet level.
      num_vision_tokens: key columns per character.
      num_dummy_tokens: key columns for the background block.

    Returns:
      ``[batch, height*width, num_dummy_tokens + max_num_ips*num_vision_tokens]``
      bias (0 where attendable, -10000 elsewhere); broadcastable over heads.
    """
    batch, max_ips, _ = bbox.shape
    xg, yg = _pixel_grid(height, width)                      # [S]
    b = bbox.astype(jnp.float32)
    x1, y1 = b[..., 0][:, None, :], b[..., 1][:, None, :]     # [B, 1, I]
    x2, y2 = b[..., 2][:, None, :], b[..., 3][:, None, :]
    xg = xg[None, :, None]                                    # [1, S, 1]
    yg = yg[None, :, None]
    inside = (xg >= x1) & (xg <= x2) & (yg >= y1) & (yg <= y2)  # [B, S, I]

    ip_bias = jnp.where(inside, 0.0, MASK_VALUE)              # [B, S, I]
    dummy_bias = jnp.where(inside.any(axis=-1, keepdims=True), MASK_VALUE, 0.0)

    ip_bias = jnp.repeat(ip_bias, num_vision_tokens, axis=-1)      # [B, S, I*V]
    dummy_bias = jnp.repeat(dummy_bias, num_dummy_tokens, axis=-1)  # [B, S, D]
    return jnp.concatenate([dummy_bias, ip_bias], axis=-1).astype(dtype)


def build_ip_token_mask(bbox: jnp.ndarray, height: int, width: int,
                        num_vision_tokens: int, num_dummy_tokens: int) -> jnp.ndarray:
    """Boolean attendable-mask variant (True = attend); used by the Pallas kernel."""
    bias = build_ip_attention_bias(bbox, height, width, num_vision_tokens,
                                   num_dummy_tokens, dtype=jnp.float32)
    return bias == 0.0


def rasterize_dialog_embedding(
    sample: jnp.ndarray,
    dialog_bbox: jnp.ndarray,
    embedding: jnp.ndarray,
) -> jnp.ndarray:
    """Add a learned channel embedding inside every dialog bbox.

    Args:
      sample: ``[batch, height, width, channels]`` (NHWC) post-conv_in features.
      dialog_bbox: ``[batch, max_num_dialogs, 4]`` relative [x1, y1, x2, y2].
      embedding: ``[channels]`` learned dialog embedding.

    Pixel-inclusion semantics of ``unet.py:100-110``: integer bounds
    ``x1 = floor(rel_x1 * width)`` etc., half-open ``[x1, x2) x [y1, y2)``, and the
    union of boxes receives a single copy of the embedding (the reference writes —
    not accumulates — the embedding per box, so overlaps don't double-count).
    """
    batch, height, width, channels = sample.shape
    bb = dialog_bbox.astype(jnp.float32)
    x1 = jnp.floor(bb[..., 0] * width)
    y1 = jnp.floor(bb[..., 1] * height)
    x2 = jnp.floor(bb[..., 2] * width)
    y2 = jnp.floor(bb[..., 3] * height)

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    # [B, D, H] / [B, D, W] per-axis inclusion, then outer-AND and any over D
    in_y = (ys[None, None, :] >= y1[..., None]) & (ys[None, None, :] < y2[..., None])
    in_x = (xs[None, None, :] >= x1[..., None]) & (xs[None, None, :] < x2[..., None])
    inside = jnp.einsum("bdh,bdw->bhw", in_y.astype(jnp.float32),
                        in_x.astype(jnp.float32)) > 0.0      # [B, H, W]
    add = inside[..., None].astype(sample.dtype) * embedding.astype(sample.dtype)
    return sample + add
