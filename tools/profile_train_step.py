"""TPU op profile of the UNet train step (fwd+bwd), containment-aware.

The inference path has a per-bucket in-loop profile with measured verdicts
(docs/PERF.md); this gives the backward the same treatment (VERDICT r2 weak
#1): capture a trace of the remat fwd+bwd at BENCH_TRAIN_RES² and aggregate
XLA-op self-times with the containment-stack method (tools/xplane.py).

Usage (on the chip): python tools/profile_train_step.py [trace_dir]
Env: BENCH_TRAIN_RES (1024), PROFILE_STEPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


import re


def _opkind(name: str) -> str:
    """HLO op kind of a trace event: the callee right before '(' on the RHS
    of ``%x = type kind(...)``. Matching substrings anywhere in the event
    name is WRONG — operand lists repeat producer op names (a fusion fed by
    a custom-call contains 'custom-call' in its text)."""
    m = re.match(r"%[\w.\-]+ = \S+ ([\w\-]+)\(", name)
    if m:
        return m.group(1)
    m = re.match(r"%([\w\-]+)", name)
    return m.group(1).rstrip(".0123456789") if m else name[:20]


def classify(name: str) -> str:
    kind = _opkind(name)
    if kind.startswith("flash_attention"):
        return "flash attention (fwd+bwd kernels)"
    if kind == "custom-call":
        return "other custom calls (Pallas/DMA)"
    if "fusion" in kind:
        rhs = name.split(" = ", 1)[1] if " = " in name else name
        out = rhs.split("{")[0]
        if "[3,3," in rhs:
            return "fusions: conv (3x3 weights in play)"
        if re.search(r"\[\d+,\d+,(5120|10240)\]", rhs):
            return "fusions: GEGLU/FF matmuls"
        if re.search(r"\[\d+,\d+,\d+,\d+\]", out):
            return "fusions: 4D acts (GN/resnet elementwise)"
        if kind != "fusion":
            return "fusions: reduce/stats (LN/GN/loss)"
        return "fusions: 2D/3D matmul+elementwise"
    if kind in ("copy", "transpose", "bitcast", "reshape", "slice", "pad",
                "concatenate") or kind.startswith("dynamic"):
        return "copies/layout"
    if kind.startswith(("copy-", "async", "slice-", "all-reduce")):
        return "async/DMA bookkeeping"
    if kind.startswith(("reduce", "convert", "broadcast")):
        return "reduce/convert/broadcast"
    if kind.startswith("convolution"):
        return "convolutions (XLA)"
    if kind.startswith("dot"):
        return "dots (shifted-conv/matmul)"
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_profile"
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype,
                          remat_blocks=True)
    res = int(os.environ.get("BENCH_TRAIN_RES", "1024"))
    steps = int(os.environ.get("PROFILE_STEPS", "3"))
    b, lh, lw = 1, res // 8, res // 8

    ctx = jnp.zeros((b, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), dtype)
    time_ids = jnp.full((b, 6), float(res), jnp.float32)
    ip_tokens = jnp.zeros((b, manga.num_context_image_tokens,
                           cfg.cross_attention_dim), dtype)
    bbox = jnp.asarray([[[0., 0., .5, 1.], [.5, 0., 1., 1.],
                         [0.] * 4, [0.] * 4]], jnp.float32)
    biases = {
        level: build_ip_attention_bias(bbox, lh >> level, lw >> level,
                                       manga.num_vision_tokens,
                                       manga.num_dummy_tokens, dtype=dtype)
        for level in attention_levels(cfg)
    }
    dialog = jnp.zeros((b, manga.max_num_dialogs, 4), jnp.float32)
    sample = jnp.zeros((b, lh, lw, cfg.in_channels), dtype)
    t = jnp.full((b,), 500.0, jnp.float32)
    target = jnp.ones((b, lh, lw, cfg.out_channels), jnp.float32)

    # zeros tree via eval_shape — identical timing, skips the on-device init
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), sample, t, ctx, pooled, time_ids,
        ip_hidden_states=ip_tokens, ip_attn_bias=biases, ip_scale=1.0,
        dialog_bbox=dialog)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def loss_fn(p, x):
        pred = unet.apply(p, x, t, ctx, pooled, time_ids,
                          ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                          ip_scale=1.0, dialog_bbox=dialog)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, sample)
    float(loss)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    del grads

    x = sample
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        loss, grads = grad_fn(params, x)
        leaf = jax.tree.leaves(grads)[0]
        x = (x + 0.0 * jnp.mean(leaf.astype(jnp.float32))).astype(dtype)
        del grads
    float(jnp.sum(x.astype(jnp.float32)))
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    import xplane

    path = xplane.find_xspace(trace_dir)
    buckets = xplane.aggregate(path, classify)
    total = sum(v["ms"] for v in buckets.values())
    print(f"\nper-step self-time over {steps} steps "
          f"(total {total/steps:.1f} ms/step):")
    for name, v in sorted(buckets.items(), key=lambda kv: -kv[1]["ms"]):
        print(f"  {v['ms']/steps:8.2f} ms  {v['events']/steps:7.0f} ev  {name}")

    # top individual ops for drill-down
    plane = xplane.device_plane(path)
    names = xplane.event_names(plane)
    rows = xplane.self_times(xplane.xla_ops_events(plane), names)
    agg = {}
    for name, self_ps, _ in rows:
        a = agg.setdefault(name, [0.0, 0])
        a[0] += self_ps / 1e9
        a[1] += 1
    print("\ntop ops by self time (ms/step):")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {ms/steps:8.3f} ms  x{cnt//steps:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
