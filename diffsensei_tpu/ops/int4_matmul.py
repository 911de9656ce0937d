"""Packed-int4 weight-only matmul (Pallas decode kernel + XLA fallbacks).

The SEED-X 13B-class agent cannot co-reside with the diffusion stack on one
16 GB v5e unless the LLM weights really occupy ~4 bits each. ``jnp.int4``
does NOT deliver that on this runtime — measured on-device, a 1 Mi-element
s4 array occupies 1 MiB (one full byte per element), same as int8. This
module therefore packs nibbles manually and unpacks them on-chip:

* **Layout**: int4 nibbles packed two-per-byte along a *split-half* output
  axis. For logical weights ``w[in, F]`` (``F`` the padded feature count,
  see :func:`padded_features`): byte column ``j`` of ``packed[in, F//2]``
  holds output column ``j`` in its low nibble and column ``F//2 + j`` in
  its high nibble. Split-half (not adjacent-pair) packing means unpacking
  never interleaves lanes — each nibble plane is a contiguous block of
  output columns, so the kernel runs two plain MXU dots and the caller
  concatenates the halves. The two nibbles use DIFFERENT encodings, chosen
  so the decode kernel never shifts (Mosaic cannot shift i8 vectors, and
  widening to i32 costs measured 10% of the kernel): the LOW nibble stores
  ``q + 8`` (biased, in [0, 15] — the -8 is restored as a per-group
  correction inside the kernel using the already-resident x/scale blocks);
  the HIGH nibble stores two's complement, extracted as ``(b & 0xF0)``
  reinterpreted as int8 — the i8 wrap IS the sign extension and yields
  ``16*q``, the 16 being folded into a pre-divided scale.
* **Scales**: group-wise symmetric (AWQ/GPTQ-family layout, PAPERS.md) —
  fp32 ``[in/g, F]``, ``g = gcd(group, in)``; dequant is
  ``w[i, o] = q[i, o] * s[i // g, o]``.
* **Decode kernel** (the HBM-bandwidth-bound regime int4 exists for): grid
  ``(F/2 // out-tile, in // in-chunk)`` with the in-chunk axis innermost so
  Pallas double-buffers the packed byte stream HBM→VMEM. The ONLY weight
  bytes that cross HBM are the packed matrix itself (~0.5 B/param — ¼ of
  bf16, ½ of int8); nibbles are split with two u8 ANDs + i8→bf16 converts
  on the VPU (shift-free, see Layout), dotted per 128-row group on the MXU
  against the (≤16-token) activation tile, and group-scaled in fp32 on the
  [16, out] partials (8× less VPU multiply work than scaling [in, out]
  weights). An XLA formulation cannot do this: a dot operand must be
  materialized, so XLA would write + re-read the dequantized bf16 weights
  through HBM — 4.5 B/param of traffic, worse than int8. Measured v5e,
  [16,5120]@[5120,13824] (13B gate-proj): 0.180 ms/call vs 0.097 ms for
  the XLA int8-dequant dot — int4 decode is VPU-dequant-bound, not
  HBM-bound; it trades ~2× per-layer time for the 2× footprint the
  co-resident topology needs (docs/PERF.md).
* **Prefill / CPU fallback**: dequantize-then-matmul (prefill is MXU-bound;
  weight bytes don't matter) and a grouped-einsum decode fallback keeping
  the fp32 scale outside every dot (bit-matches the kernel's math class).

Reference behavior matched: the fp16 LLM matmuls inside
``src/models/mllm/modeling_llama_xformer.py`` (the reference serves them
unquantized from a large-HBM GPU; this is the 16 GB-chip equivalent).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TOKEN_PAD = 16          # bf16 sublane tile; also the decode-regime bound


def group_size(group: int, in_features: int) -> int:
    """Effective scale-group length: ``gcd(group, in)`` so any width works."""
    return math.gcd(group, in_features)


def kernel_eligible(in_features: int, group: int) -> bool:
    """True when the Pallas decode kernel supports this geometry."""
    return (in_features % 128 == 0
            and group_size(group, in_features) == 128)


def padded_features(features: int, in_features: int, group: int) -> int:
    """Stored (padded) output-feature count for a packed layout.

    Kernel-eligible layers round up to 256 so both nibble planes tile onto
    128-lane blocks (e.g. ``lm_head``'s 32330 → 32512); everything else only
    needs an even count for pairing. Converter (``quant.py``) and module
    (``llama.Int4Dense``) both derive shapes from this single function.
    """
    mult = 256 if kernel_eligible(in_features, group) else 2
    return -(-features // mult) * mult


def pack_int4_host(q: np.ndarray) -> np.ndarray:
    """[in, F] int nibbles in [-8, 7] → packed uint8 [in, F//2] (host-side).

    Low nibble: biased (``q + 8``); high nibble: two's complement — the
    shift-free decode-kernel layout (module docstring, Layout).
    """
    q = np.asarray(q, np.int32)
    assert q.shape[-1] % 2 == 0, q.shape
    half = q.shape[-1] // 2
    lo, hi = q[..., :half] + 8, q[..., half:]
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.uint8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint8 [in, F//2] → int32 nibble values [in, F] (jit-safe)."""
    b = packed.astype(jnp.int32)
    lo = (b & 0xF) - 8                    # biased storage
    hi = ((b >> 4) ^ 8) - 8               # two's complement storage
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize(packed: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.float32) -> jnp.ndarray:
    """Full dequant → [in, F] in ``dtype`` (prefill / fallback paths)."""
    in_f, f = packed.shape[0], packed.shape[1] * 2
    gn = scale.shape[0]
    q = unpack_int4(packed).reshape(gn, in_f // gn, f).astype(jnp.float32)
    return (q * scale[:, None, :]).reshape(in_f, f).astype(dtype)


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    raise ValueError(f"no block among {candidates} divides {n}")


def _decode_kernel(x_ref, q_ref, slo_ref, shi_ref, olo_ref, ohi_ref, *,
                   groups_per_chunk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        olo_ref[:] = jnp.zeros_like(olo_ref)
        ohi_ref[:] = jnp.zeros_like(ohi_ref)

    b = q_ref[:]                                    # [in_blk, out2_blk] u8
    x = x_ref[:]                                    # [16, in_blk] bf16
    gpc = groups_per_chunk
    in_blk, out2_blk = q_ref.shape
    g = in_blk // gpc

    # Shift-free unpack (module docstring, Layout). Mosaic keeps u8 AND and
    # i8→bf16 4-packed per 32-bit register; an i32 widen costs measured 10%.
    lo = (b & 0x0F).astype(jnp.int8).astype(jnp.bfloat16)   # q + 8
    hi = (b & 0xF0).astype(jnp.int8).astype(jnp.bfloat16)   # 16 * q (wrap)

    # Per-group dots; scales applied to the [16, out] partials. The lo half
    # carries the +8 bias: subtract 8 * sum(x_g) per group before scaling —
    # uses only blocks already in VMEM, zero extra HBM traffic.
    def acc_half(n, s_ref, o_ref, bias):
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        for gi in range(gpc):
            xg = x[:, gi * g:(gi + 1) * g]
            p = jnp.dot(xg, n[gi * g:(gi + 1) * g, :],
                        preferred_element_type=jnp.float32)
            if bias:
                csum = jnp.sum(xg.astype(jnp.float32), axis=-1,
                               keepdims=True)          # [16, 1]
                p = p - 8.0 * csum
            acc += p * s_ref[0, gi][None, :]
        o_ref[:] += acc

    acc_half(lo, slo_ref, olo_ref, bias=True)
    acc_half(hi, shi_ref, ohi_ref, bias=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_decode_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                       scale: jnp.ndarray, *,
                       interpret: bool = False) -> jnp.ndarray:
    """y[T, F] = x[T, in] @ dequant(packed, scale) for T ≤ 16 (decode).

    ``packed`` uint8 [in, F//2] split-half layout, ``scale`` fp32 [in/128, F]
    (the kernel requires g = 128 and in % 128 == 0 — gate with
    :func:`kernel_eligible`). Streams exactly the packed bytes from HBM.
    """
    tokens, in_f = x.shape
    assert tokens <= _TOKEN_PAD, tokens
    out2 = packed.shape[1]
    gn = scale.shape[0]
    in_blk = _pick_block(in_f, (512, 384, 256, 128))
    out2_blk = _pick_block(out2, (256, 128))
    gpc = in_blk // (in_f // gn)

    xp = jnp.zeros((_TOKEN_PAD, in_f), jnp.bfloat16).at[:tokens].set(
        x.astype(jnp.bfloat16))
    # Scales are tiny but their natural [gn, out2] layout cannot block-tile:
    # a (gpc, out2_blk) window has gpc < 8 sublanes, which Mosaic rejects
    # unless the dim is un-blocked. Fold the chunk axis out front so the
    # last-two block dims are (gpc == full dim, 128-multiple).
    n_chunks = in_f // in_blk
    s_lo = scale[:, :out2].reshape(n_chunks, gpc, out2)
    # hi nibbles arrive as 16*q (shift-free extraction) — pre-fold the /16
    s_hi = (scale[:, out2:] / 16.0).reshape(n_chunks, gpc, out2)

    grid = (out2 // out2_blk, n_chunks)
    flops = 2 * _TOKEN_PAD * in_f * out2 * 2
    kern = functools.partial(_decode_kernel, groups_per_chunk=gpc)
    y_lo, y_hi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TOKEN_PAD, in_blk), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_blk, out2_blk), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpc, out2_blk), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpc, out2_blk), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TOKEN_PAD, out2_blk), lambda j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOKEN_PAD, out2_blk), lambda j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_TOKEN_PAD, out2), jnp.float32),
            jax.ShapeDtypeStruct((_TOKEN_PAD, out2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=packed.size + scale.size * 4
            + _TOKEN_PAD * in_f * 2 + 2 * _TOKEN_PAD * out2 * 2 * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, packed, s_lo, s_hi)
    return jnp.concatenate([y_lo, y_hi], axis=-1)[:tokens]


def int4_decode_fallback(x: jnp.ndarray, packed: jnp.ndarray,
                         scale: jnp.ndarray) -> jnp.ndarray:
    """Grouped-contraction decode for CPU / kernel-ineligible shapes.

    Keeps the fp32 scale outside every dot: y = Σ_g s[g] · (x_g @ Q_g).
    """
    in_f, f = packed.shape[0], packed.shape[1] * 2
    gn = scale.shape[0]
    g = in_f // gn
    dtype = x.dtype
    q = unpack_int4(packed).reshape(gn, g, f).astype(dtype)
    xg = x.reshape(x.shape[:-1] + (gn, g))
    part = jnp.einsum("...gi,gio->...go", xg, q)
    return jnp.sum(part * scale.astype(dtype), axis=-2)
