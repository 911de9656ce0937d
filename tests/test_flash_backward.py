"""Pallas flash-attention backward vs jax.grad of the XLA oracle."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffsensei_tpu.ops.attention import attention_ref
from diffsensei_tpu.ops import flash_attention as fa


def _grads(fn, *args, diff_argnums=(0, 1, 2)):
    def loss(*xs):
        out = fn(*xs)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape).astype(out.dtype)))
    return jax.grad(loss, argnums=diff_argnums)(*args)


@pytest.mark.parametrize("sq,sk,causal", [
    (256, 256, False),
    (256, 256, True),
    (384, 320, False),    # both tails non-divisible
    (256, 320, True),
])
def test_flash_grads_match_oracle(sq, sk, causal):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 2, sq, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, sk, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, sk, 64)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = _grads(functools.partial(fa.flash_attention, causal=causal,
                                       block_q=128, block_k=128), q, k, v)
    want = _grads(functools.partial(attention_ref, causal=causal), q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_flash_grads_with_bias():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 256, 32)).astype(np.float32))
    bias = jnp.asarray(
        rng.choice([0.0, -10000.0], size=(2, 1, 256, 256)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = _grads(lambda a, b, c: fa.flash_attention(
            a, b, c, bias, block_q=128, block_k=128), q, k, v)
    want = _grads(lambda a, b, c: attention_ref(a, b, c, bias), q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_flash_forward_still_matches():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 1, 320, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 320, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 320, 64)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
