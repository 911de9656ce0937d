"""Shifted-matmul 3x3 conv (ops/conv3x3.py) vs XLA's native convolution."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.ops.conv3x3 import conv3x3, conv3x3_shifted


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def test_shifted_matches_xla_conv_fp32():
    rng = np.random.default_rng(0)
    for shape, cout in [((2, 7, 5, 8), 12), ((1, 9, 9, 16), 16),
                        ((3, 4, 6, 3), 5)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cout)) * 0.1,
                        jnp.float32)
        np.testing.assert_allclose(
            np.asarray(conv3x3_shifted(x, w)), np.asarray(_xla_conv(x, w)),
            rtol=1e-5, atol=1e-5)


def test_shifted_matches_xla_conv_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.bfloat16)
    got = np.asarray(conv3x3_shifted(x, w), np.float32)
    want = np.asarray(_xla_conv(x, w), np.float32)
    # both accumulate fp32; only the final bf16 round can differ by 1 ulp
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_dispatch_threshold_and_force():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)) * 0.1, jnp.float32)
    # narrow input: dispatch falls back to XLA -> bit-identical to native
    np.testing.assert_array_equal(np.asarray(conv3x3(x, w)),
                                  np.asarray(_xla_conv(x, w)))
    # forced shifted path agrees numerically
    np.testing.assert_allclose(np.asarray(conv3x3(x, w, force="shifted")),
                               np.asarray(_xla_conv(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_shifted_gradients_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 6)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 4)) * 0.1, jnp.float32)

    def loss(fn, x, w):
        return jnp.sum(jnp.tanh(fn(x, w)))

    gx_s, gw_s = jax.grad(lambda x, w: loss(conv3x3_shifted, x, w),
                          argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(lambda x, w: loss(_xla_conv, x, w),
                          argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_conv3x3_module_drop_in_param_layout():
    """Conv3x3 must expose nn.Conv's exact param pytree (kernel/bias) so
    ports and existing checkpoints are unaffected."""
    from flax import linen as nn

    from diffsensei_tpu.models.layers import Conv3x3

    x = jnp.ones((1, 4, 4, 8))
    mod = Conv3x3(16)
    ref = nn.Conv(16, (3, 3), padding=1)
    p_mod = mod.init(jax.random.key(0), x)
    p_ref = ref.init(jax.random.key(0), x)
    assert jax.tree.structure(p_mod) == jax.tree.structure(p_ref)
    assert jax.tree.map(jnp.shape, p_mod) == jax.tree.map(jnp.shape, p_ref)
    # same init distribution family -> swapping params across modules works
    np.testing.assert_allclose(
        np.asarray(mod.apply(p_ref, x)), np.asarray(ref.apply(p_ref, x)),
        rtol=1e-5, atol=1e-5)


def test_module_wide_channel_dispatch_matches_xla():
    """At Cin >= SHIFTED_MIN_CIN the Conv3x3 module takes the shifted path;
    its output must match nn.Conv with the same params (fp32, tiny spatial)."""
    from flax import linen as nn

    from diffsensei_tpu.models.layers import Conv3x3
    from diffsensei_tpu.ops.conv3x3 import SHIFTED_MIN_CIN

    cin = SHIFTED_MIN_CIN + 60
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 5, cin)), jnp.float32)
    mod = Conv3x3(8)
    ref = nn.Conv(8, (3, 3), padding=1)
    params = ref.init(jax.random.key(1), x)
    got = np.asarray(mod.apply(params, x))
    want = np.asarray(ref.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # and gradients flow through the custom-VJP shifted path
    g = jax.grad(lambda p: jnp.sum(jnp.tanh(mod.apply(p, x))))(params)
    assert all(float(jnp.abs(v).sum()) > 0 for v in jax.tree.leaves(g))
