"""Capture + summarize a TPU op profile of one SDXL manga UNet forward.

Usage (on the chip): python tools/profile_unet.py [trace_dir]
Parses the xplane with tensorboard_plugin_profile and prints the top ops by
self time — the data that decides where kernel work is worth spending.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_profile"
    from diffsensei_tpu.core.config import UNetConfig
    from diffsensei_tpu.models.unet import UNetMangaModel, attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias

    dtype = jnp.bfloat16
    cfg = UNetConfig.sdxl()
    manga = cfg.manga
    unet = UNetMangaModel(cfg, dtype=dtype, param_dtype=dtype)
    b, lh, lw = 2, 128, 128

    ctx = jnp.zeros((b, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), dtype)
    time_ids = jnp.full((b, 6), 1024.0, jnp.float32)
    ip_tokens = jnp.zeros((b, manga.num_context_image_tokens,
                           cfg.cross_attention_dim), dtype)
    bbox = jnp.tile(jnp.asarray([[[0., 0., .5, 1.], [.5, 0., 1., 1.],
                                  [0.] * 4, [0.] * 4]], jnp.float32), (b, 1, 1))
    biases = {
        level: build_ip_attention_bias(bbox, lh >> level, lw >> level,
                                       manga.num_vision_tokens,
                                       manga.num_dummy_tokens, dtype=dtype)
        for level in attention_levels(cfg)
    }
    dialog = jnp.zeros((b, manga.max_num_dialogs, 4), jnp.float32)
    sample = jnp.zeros((b, lh, lw, cfg.in_channels), dtype)
    t = jnp.full((b,), 500.0, jnp.float32)

    print("init params...", flush=True)
    params = unet.init(jax.random.key(0), sample, t, ctx, pooled, time_ids,
                       ip_hidden_states=ip_tokens, ip_attn_bias=biases,
                       ip_scale=0.6, dialog_bbox=dialog)

    fwd = jax.jit(lambda p, x, t: unet.apply(
        p, x, t, ctx, pooled, time_ids, ip_hidden_states=ip_tokens,
        ip_attn_bias=biases, ip_scale=0.6, dialog_bbox=dialog))
    out = fwd(params, sample, t)
    print("warm:", float(jnp.sum(out.astype(jnp.float32))), flush=True)

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fwd(params, out.astype(dtype) * 0.1, t)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane files found; host-only trace?")
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "op_profile", {})
        prof = json.loads(data)

        def walk(node, depth=0, out=None):
            out = out if out is not None else []
            m = node.get("metrics", {})
            if m.get("selfTimePs", 0) and node.get("name"):
                out.append((m["selfTimePs"], node["name"]))
            for c in node.get("children", []):
                walk(c, depth + 1, out)
            return out

        root = prof.get("byProgram") or prof.get("byCategory") or prof
        rows = sorted(walk(root), reverse=True)[:25]
        total = sum(r[0] for r in rows) or 1
        print("\ntop self-time ops:")
        for ps, name in rows:
            print(f"  {ps/1e9:8.3f} ms  {name[:90]}")
    except Exception as e:  # noqa: BLE001
        print(f"op_profile parse failed: {type(e).__name__}: {e}")
        print("raw xplanes at:", xplanes)


if __name__ == "__main__":
    main()
