"""Packed-int4 decode kernel (ops/int4_matmul.py) — layout + parity.

The co-residence lever: ``jnp.int4`` occupies one byte per element on this
runtime (measured on-device), so 4-bit residency and 4-bit decode bandwidth
both require the manual nibble packing these tests pin down. Kernel runs in
interpret mode (CPU suite); the real-chip numbers live in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.ops.int4_matmul import (dequantize, int4_decode_fallback,
                                            int4_decode_matmul,
                                            kernel_eligible, pack_int4_host,
                                            padded_features, unpack_int4)


def _random_packed(rng, in_f, features, group=128):
    padded = padded_features(features, in_f, group)
    nib = rng.integers(-8, 8, (in_f, padded)).astype(np.int32)
    gn = in_f // np.gcd(group, in_f)
    scale = rng.uniform(0.01, 0.05, (gn, padded)).astype(np.float32)
    return jnp.asarray(pack_int4_host(nib)), jnp.asarray(scale), nib


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    nib = rng.integers(-8, 8, (64, 32)).astype(np.int32)
    packed = pack_int4_host(nib)
    assert packed.shape == (64, 16) and packed.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(unpack_int4(jnp.asarray(packed))),
                                  nib)


def test_padded_features_rules():
    # kernel-eligible (in % 128 == 0, g == 128): round up to 256
    assert padded_features(32330, 5120, 128) == 32512
    assert padded_features(5120, 5120, 128) == 5120
    assert kernel_eligible(5120, 128) and kernel_eligible(13824, 128)
    # ineligible (tiny test shapes): only even for nibble pairing
    assert padded_features(24, 64, 16) == 24
    assert padded_features(31, 64, 16) == 32
    assert not kernel_eligible(64, 16)


def test_dequantize_matches_unpack_times_scale():
    rng = np.random.default_rng(1)
    packed, scale, nib = _random_packed(rng, 256, 48)
    w = np.asarray(dequantize(packed, scale))
    ref = nib.astype(np.float32).reshape(2, 128, -1) * np.asarray(scale)[:, None]
    np.testing.assert_allclose(w, ref.reshape(256, -1), rtol=0, atol=0)


@pytest.mark.parametrize("in_f,features,tokens",
                         [(256, 512, 1), (384, 512, 16), (512, 256, 3)])
def test_decode_kernel_matches_bf16_reference(in_f, features, tokens):
    """Interpret-mode kernel vs a bf16 dequant matmul: same math class."""
    rng = np.random.default_rng(2)
    packed, scale, _ = _random_packed(rng, in_f, features)
    x = jnp.asarray(rng.normal(size=(tokens, in_f)), jnp.float32)
    got = int4_decode_matmul(x, packed, scale, interpret=True)
    ref = jnp.dot(x.astype(jnp.bfloat16),
                  dequantize(packed, scale, jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    assert got.shape == (tokens, scale.shape[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # and against the fp32 grouped-contraction fallback (bf16-class tolerance)
    fb = int4_decode_fallback(x, packed, scale)
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(fb))
           / np.linalg.norm(np.asarray(fb)))
    assert rel < 2e-2, rel


def test_int4dense_pads_and_slices_odd_features():
    """lm_head-like odd feature counts: padded params, sliced output."""
    from diffsensei_tpu.models.mllm.llama import Int4Dense

    rng = np.random.default_rng(3)
    layer = Int4Dense(300, group=128, dtype=jnp.float32)
    params = layer.init(jax.random.key(0), jnp.zeros((1, 1, 256)))
    q = params["params"]["kernel_q"]
    assert q.shape == (256, 256) and q.dtype == jnp.uint8  # padded 300→512
    x = jnp.asarray(rng.normal(size=(1, 4, 256)), jnp.float32)
    y_dec = layer.apply(params, x)                   # decode lowering
    y_pre = layer.apply(params, jnp.tile(x, (1, 8, 1)))[:, :4]   # prefill
    assert y_dec.shape == (1, 4, 300)
    rel = (np.linalg.norm(np.asarray(y_dec) - np.asarray(y_pre))
           / np.linalg.norm(np.asarray(y_pre)))
    assert rel < 2e-2, rel
