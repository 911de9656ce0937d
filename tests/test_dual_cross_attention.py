"""Fused dual (text + masked-IP) cross-attention kernel vs the XLA composite.

Measured on v5e: the kernel achieves PARITY with the composite, not a win
(docs/PERF.md) — the model keeps the XLA path; the kernel stays as a tested
opt-in so the verdict is reproducible.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from diffsensei_tpu.ops.dual_cross_attention import (
    _composite, dual_cross_attention)


def _inputs(b=2, h=3, s=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *shape: jnp.asarray(rng.normal(size=shape), jnp.float32)
    bias = jnp.asarray(
        np.where(rng.uniform(size=(b, 1, s, 80)) > 0.4, 0.0, -10000.0),
        jnp.float32)
    return (mk(b, h, s, d), mk(b, h, 77, d), mk(b, h, 77, d),
            mk(b, h, 80, d), mk(b, h, 80, d), bias)


def test_kernel_matches_composite():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        ot, oi = dual_cross_attention(*args)
    rt, ri = _composite(*args, sm_scale=args[0].shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(rt), atol=2e-6)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=2e-6)


def test_kernel_odd_seq_tail():
    args = _inputs(s=50)  # q length not a block multiple
    with pltpu.force_tpu_interpret_mode():
        ot, oi = dual_cross_attention(*args, block_q=32)
    rt, ri = _composite(*args, sm_scale=args[0].shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(rt), atol=2e-6)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=2e-6)


def test_gradients_match_composite_with_zero_bias_grad():
    args = _inputs(seed=1)
    q, kt, vt, ki, vi, bias = args

    def loss(fn, *a):
        o1, o2 = fn(*a)
        return jnp.sum(jnp.tanh(o1 + 0.6 * o2))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(lambda *a: loss(
            lambda *x: dual_cross_attention(*x, bias), *a),
            argnums=(0, 1, 2, 3, 4))(q, kt, vt, ki, vi)
    gr = jax.grad(lambda *a: loss(
        lambda *x: _composite(*x, bias, q.shape[-1] ** -0.5), *a),
        argnums=(0, 1, 2, 3, 4))(q, kt, vt, ki, vi)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
