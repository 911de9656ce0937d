"""Pallas flash attention vs XLA oracle (interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffsensei_tpu.ops.attention import attention_ref, multi_head_attention
from diffsensei_tpu.ops import flash_attention as fa


def run_flash(*args, **kwargs):
    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(*args, **kwargs)


@pytest.mark.parametrize("sq,sk,bq,bk", [
    (256, 256, 128, 128),
    (384, 256, 128, 128),   # q not multiple of 256
    (256, 320, 128, 128),   # k tail masking (320 % 128 != 0)
    (128, 128, 128, 128),
])
def test_flash_matches_oracle(sq, sk, bq, bk):
    rng = np.random.default_rng(0)
    shape_q = (1, 2, sq, 64)
    shape_k = (1, 2, sk, 64)
    q = jnp.asarray(rng.normal(size=shape_q).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape_k).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape_k).astype(np.float32))
    got = run_flash(q, k, v, block_q=bq, block_k=bk)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_causal():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 32)).astype(np.float32))
    got = run_flash(q, k, v, causal=True, block_q=128, block_k=128)
    want = attention_ref(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_with_broadcast_bias():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    # bias broadcast over heads (masked-IP style)
    bias = jnp.asarray(
        rng.choice([0.0, -10000.0], size=(2, 1, 256, 256)).astype(np.float32))
    got = run_flash(q, k, v, bias, block_q=128, block_k=128)
    want = attention_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 1, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 1, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 1, 256, 64)), jnp.bfloat16)
    got = run_flash(q, k, v, block_q=128, block_k=128)
    want = attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_dispatcher_uses_xla_on_cpu():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 1, 64, 16)).astype(np.float32))
    out = multi_head_attention(q, q, q)
    want = attention_ref(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
