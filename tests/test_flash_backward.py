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


def test_attn_names_policy_prunes_forward_replay():
    """The attn_out/attn_lse checkpoint tags (flash_attention's split
    kernel/gradient structure) must actually remove the forward Pallas kernel
    from the remat replay — the 'replayed flash forwards' shelf of the
    round-3 train profile (docs/PERF.md).

    Trace-level check (make_jaxpr executes nothing): interpret-mode pallas
    carries an OrderedIOEffect that jax.checkpoint's partial-eval rejects, so
    remat-over-flash cannot EXECUTE on CPU at all — numerics of the policy
    path are covered by test_deep_stacks (XLA attention) and the backward
    itself by the oracle tests above (saved vs replayed (o, lse) are the same
    kernel outputs either way)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))

    def f(a, b, c):
        return fa.flash_attention(a, b, c, block_q=128, block_k=128)

    full = jax.checkpoint(f)
    named = jax.checkpoint(f, policy=jax.checkpoint_policies
                           .save_only_these_names("attn_out", "attn_lse"))

    def n_kernels(g):
        return str(jax.make_jaxpr(jax.grad(
            lambda *xs: jnp.sum(g(*xs))))(q, k, v)).count("pallas_call")

    # full recompute: fwd + replayed fwd + dq + dkv = 4; the names policy
    # saves (o, lse) so the replayed forward is dead code = 3.
    assert n_kernels(full) == 4
    assert n_kernels(named) == 3


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
