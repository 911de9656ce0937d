"""3x3 stride-1 SAME convolution as nine shifted matmuls.

XLA's native TPU convolution leaves MXU throughput on the table for the
UNet's wide-channel 3x3 convs: profiled inside the 20-step denoise program
(docs/PERF.md round 2), the 1280->1280 conv at 32^2 runs ~1.5 ms (~20% MXU)
while plain matmuls of the same FLOPs hit ~90%. Decomposing the convolution as

    y[p] = sum_{dy,dx} x[p + (dy,dx)] @ W[dy, dx]

turns it into nine [B*H*W, Cin] x [Cin, Cout] matmuls over a once-padded
input — the shapes the MXU is best at. Measured on v5e (microbench,
median-of-5): 960->320@128^2 2.93->2.11 ms, 1920->640@64^2 2.39->1.96 ms,
1280->1280@32^2 1.47->1.24 ms, 2560->1280@32^2 2.01->1.62 ms vs
``lax.conv_general_dilated``; parity (within fp32-accumulation
reassociation) with the XLA conv. Narrow convs (Cin < ``SHIFTED_MIN_CIN``)
measure at parity or slightly behind, so they stay on the XLA path.

This replaces a CUDA-library dependency surface in the reference (diffusers
UNet blocks run cuDNN convolutions, SURVEY.md §2.6); here the "native" fast
path is expressed directly against the MXU's preferred contraction shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Contraction width at which the shifted-matmul path measured faster than
# XLA's conv on v5e. 320/640-channel convs measured at parity — left on XLA,
# which also keeps tiny test configs on the reference-identical path.
SHIFTED_MIN_CIN = 900


def _xla_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


@jax.custom_vjp
def conv3x3_shifted(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3 conv, NHWC x HWIO -> NHWC, fp32 accumulation.

    Equivalent to ``lax.conv_general_dilated(x, kernel, (1, 1), "SAME")`` up
    to fp32 sum reassociation (the nine partial products are accumulated in
    fp32, like XLA's conv).

    The VJP differentiates through XLA's native conv instead of the nine
    pad/slice/dot primitives: autodiffing the shifted form measured a 9%
    train-step regression (132 -> 144 ms at 512^2 fwd+bwd) because the slice
    gradients materialize nine padded fp32 accumulators, while XLA's
    conv-transpose gradient kernels are already tuned. The two forwards are
    the same mathematical function, so XLA-conv's VJP is exactly the shifted
    forward's VJP.
    """
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + w, c))
            out = out + lax.dot_general(
                patch.reshape(b * h * w, c), kernel[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(b, h, w, cout)
    return out.astype(x.dtype)


def _shifted_fwd(x, kernel):
    return conv3x3_shifted(x, kernel), (x, kernel)


def _shifted_bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_xla_conv, x, kernel)
    return vjp(g)


conv3x3_shifted.defvjp(_shifted_fwd, _shifted_bwd)


def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
            force: str | None = None) -> jnp.ndarray:
    """Dispatching SAME stride-1 3x3 conv (no bias).

    ``force``: None (measured dispatch), "shifted", or "xla".
    """
    use_shifted = (force == "shifted" or
                   (force is None and x.shape[-1] >= SHIFTED_MIN_CIN))
    if use_shifted:
        return conv3x3_shifted(x, kernel)
    return _xla_conv(x, kernel)
