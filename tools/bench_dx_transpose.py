"""Attack the train-step layout-copies shelf (VERDICT r3 weak #2 / task 4).

The round-3 training profile (docs/PERF.md) shows 17.9 ms/step of layout
copies, mostly weight-matrix ``{1,0} -> {0,1}`` transposes the backward
re-materializes EVERY step for ``dX = dY @ W^T`` (~940 copies/step at SDXL
1024²). Three candidate formulations of that product, timed on-chip inside
one jitted fori_loop (chained through the accumulator; host fetch at the
end — axon timing methodology, docs/PERF.md):

  A. ``dY @ W.T``                     — an explicit transpose node (what a
                                        naive translation writes);
  B. ``dot_general(dY, W, contract last-with-last)`` — what JAX's dot_general
                                        transpose rule actually emits in
                                        autodiff: no transpose node, but XLA
                                        may still materialize a relaid copy
                                        to feed the MXU;
  C. ``dY @ Wt`` with ``Wt`` resident — pre-transposed kernel storage: zero
                                        per-step relayout, costs 2x weight
                                        memory (5.2 GB extra at SDXL bf16 —
                                        only affordable in partitioned/FSDP
                                        modes).

Shapes: the step's dominant backward products (GEGLU up/down + qkv/out
projections at level-1 seq, CFG batch 2). The verdict (win or floor) goes to
docs/PERF.md either way.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 50

# (rows, in_features, out_features): dX = dY[rows, out] x W[in, out]^T
SHAPES = [
    ("geglu_up_l1", 8192, 1280, 10240),
    ("geglu_down_l1", 8192, 10240, 1280),
    ("qkv_l1", 8192, 1280, 1280),
    ("geglu_up_l2", 2048, 2560, 5120),
]


def timeit(fn, *args):
    x = fn(*args)
    float(jnp.sum(x.astype(jnp.float32)))       # compile + barrier
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        x = fn(*args)
        float(jnp.sum(x.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3                    # ms per product


def main() -> None:
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"# backend={jax.default_backend()}")

    for name, rows, fin, fout in SHAPES:
        key = jax.random.key(0)
        dy = jax.random.normal(key, (rows, fout), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (fin, fout), jnp.bfloat16)
        wt = jnp.asarray(w.T)                   # resident pre-transposed

        @jax.jit
        def f_a(dy, w):
            def body(i, acc):
                return (acc @ w.T) @ w * 1e-3   # chain: [rows,in] -> [rows,out]
            return jax.lax.fori_loop(0, REPS, body, dy)

        @jax.jit
        def f_b(dy, w):
            def body(i, acc):
                dx = jax.lax.dot_general(acc, w, (((1,), (1,)), ((), ())))
                return dx @ w * 1e-3
            return jax.lax.fori_loop(0, REPS, body, dy)

        @jax.jit
        def f_c(dy, w, wt):
            def body(i, acc):
                return (acc @ wt) @ w * 1e-3
            return jax.lax.fori_loop(0, REPS, body, dy)

        a = timeit(f_a, dy, w)
        bt = timeit(f_b, dy, w)
        c = timeit(f_c, dy, w, wt)
        flops = 2 * rows * fin * fout * 2       # two matmuls per body
        print(f"{name}: A(transpose) {a:.4f} ms  B(dimnums) {bt:.4f} ms  "
              f"C(pre-T resident) {c:.4f} ms   "
              f"[{flops / 1e9:.1f} GFLOP/iter]", flush=True)


def fwdbwd() -> None:
    """Phase 2: the copies shelf is a WHOLE-PROGRAM phenomenon (phase 1 shows
    isolated formulations tie), so measure a real fwd+bwd: a GEGLU-shaped MLP
    stack differentiated (a) normally — autodiff reads W transposed in the
    backward, XLA materializes relaid copies — vs (b) through a custom-VJP
    dense whose backward consumes a RESIDENT pre-transposed kernel (2x weight
    memory). The delta bounds what threading pre-transposed kernels through
    the UNet could recover of the 17.9 ms/step copies bucket."""
    import functools

    rows, fin, fout, depth = 8192, 1280, 10240, 8

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def dense_pt(x, w, wt):
        return x @ w

    def _fwd(x, w, wt):
        return x @ w, (x, wt)

    def _bwd(res, dy):
        x, wt = res
        dx = dy @ wt                                    # resident, no relayout
        dw = jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())))
        return dx, dw, jnp.zeros_like(wt)

    dense_pt.defvjp(_fwd, _bwd)

    key = jax.random.key(0)
    ws = [jax.random.normal(jax.random.fold_in(key, i),
                            (fin if i % 2 == 0 else fout,
                             fout if i % 2 == 0 else fin),
                            jnp.bfloat16) * 0.02 for i in range(depth)]
    wts = [jnp.asarray(w.T) for w in ws]
    x0 = jax.random.normal(jax.random.fold_in(key, 99), (rows, fin),
                           jnp.bfloat16)

    def loss_plain(ws, x):
        for w in ws:
            x = jnp.tanh(x @ w)
        return jnp.sum(x.astype(jnp.float32))

    def loss_pt(ws, wts, x):
        for w, wt in zip(ws, wts):
            x = jnp.tanh(dense_pt(x, w, wt))
        return jnp.sum(x.astype(jnp.float32))

    # scale the WEIGHTS by a loop-dependent factor so the transposed reads
    # cannot be hoisted out of the loop (in the real train step the weights
    # change every step, so the relayout re-materializes every step)
    @jax.jit
    def g_plain(ws, x):
        def body(i, acc):
            wi = jax.tree.map(lambda w: w * (1 + 1e-6 * i), ws)
            g = jax.grad(loss_plain)(wi, x)
            return jax.tree.map(lambda a, b: a + b * 1e-3, acc, g)
        return jax.lax.fori_loop(0, 10, body, jax.tree.map(jnp.zeros_like, ws))

    @jax.jit
    def g_pt(ws, wts, x):
        def body(i, acc):
            wi = jax.tree.map(lambda w: w * (1 + 1e-6 * i), ws)
            wti = jax.tree.map(lambda w: w * (1 + 1e-6 * i), wts)
            g = jax.grad(loss_pt)(wi, wti, x)
            return jax.tree.map(lambda a, b: a + b * 1e-3, acc, g)
        return jax.lax.fori_loop(0, 10, body, jax.tree.map(jnp.zeros_like, ws))

    def timeit10(fn, *args):
        out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(out[0].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / 10 * 1e3

    a = timeit10(g_plain, ws, x0)
    b = timeit10(g_pt, ws, wts, x0)
    # parity check
    ga = g_plain(ws, x0)
    gb = g_pt(ws, wts, x0)
    import numpy as np
    err = max(float(jnp.max(jnp.abs(x.astype(jnp.float32) -
                                    y.astype(jnp.float32))))
              for x, y in zip(ga, gb))
    print(f"fwd+bwd {depth}-layer MLP [{rows}x{fin}<->{fout}]: "
          f"plain-autodiff {a:.3f} ms/step  pre-T-resident {b:.3f} ms/step  "
          f"(max grad drift {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
    fwdbwd()
