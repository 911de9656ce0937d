"""Fused GroupNorm+SiLU kernel parity (interpret mode) + gradients."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from diffsensei_tpu.ops.groupnorm import (
    _fused, groupnorm_silu, groupnorm_silu_ref)


def _inputs(b=2, h=6, w=10, c=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    return x, scale, bias


def test_kernel_matches_reference():
    x, scale, bias = _inputs()
    with pltpu.force_tpu_interpret_mode():
        got = _fused(x, scale, bias, 4, 1e-5)
    want = groupnorm_silu_ref(x, scale, bias, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_reference_matches_flax_groupnorm_plus_silu():
    from flax import linen as nn
    x, scale, bias = _inputs(c=8)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": scale, "bias": bias}}
    want = nn.silu(gn.apply(params, x))
    got = groupnorm_silu_ref(x, scale, bias, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_reference():
    x, scale, bias = _inputs(b=1, h=4, w=4, c=8, seed=1)

    def loss_fused(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.square(_fused(x, s, b, 2, 1e-5)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.square(groupnorm_silu_ref(x, s, b, 2)))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for g, w, name in zip(got, want, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_dispatcher_fallback_on_cpu():
    x, scale, bias = _inputs()
    out = groupnorm_silu(x, scale, bias, 4)   # CPU -> jnp ref path
    want = groupnorm_silu_ref(x, scale, bias, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
