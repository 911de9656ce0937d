"""LLaMA for the SEED-X agent, TPU-native.

Capability match for the reference's xformers LLaMA fork
(``src/models/mllm/modeling_llama_xformer.py``: RMSNorm + rotary + causal
memory-efficient attention ``:224-237`` + SwiGLU MLP, 40 layers at 5120 hidden
for the SEED-X 13B-class LLM) rebuilt for XLA/Pallas:

* causal attention routes through ``ops.attention.multi_head_attention`` → the
  Pallas flash kernel on TPU (replacing xformers CUDA);
* **LoRA is native**: every projection is a ``LoRADense`` computing
  ``x @ W + (alpha/r) * (x @ A) @ B`` with W frozen at train time — the optax
  trainable-mask selects ``lora_a/lora_b`` (+ norms + embeddings, mirroring the
  reference peft config ``configs/train/diffsensei/mllm.yaml:15-31``);
* decode uses a **static-shape KV cache** updated with
  ``lax.dynamic_update_slice`` so the whole generate loop jits (the reference
  runs HF ``generate`` in Python per token);
* tensor parallelism: head and MLP dims shard over the mesh ``model`` axis via
  the rules in ``parallel.mesh.llm_param_sharding_rules`` — attention/MLP
  matmuls become column/row-parallel with one psum per block over ICI.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import LlamaConfig
from diffsensei_tpu.ops.attention import multi_head_attention

Dtype = Any


class Int8Dense(nn.Module):
    """Weight-only int8 dense: per-output-channel symmetric quantization.

    Serving-only (no bias, no grad path intended): ``y = (x @ Q) * s`` where
    ``Q`` is int8 ``[in, out]`` and ``s`` fp32 ``[out]`` — the per-channel
    scale factors out of the contraction, so the matmul reads the weight
    matrix as int8 straight from HBM (XLA fuses the int8→bf16 convert into
    the dot operand) and applies one multiply on the [.., out] result. Halves
    the weight-bandwidth of the HBM-bound autoregressive decode and the
    resident footprint — the lever that fits SEED-X's 13B-class LLM
    (~26 GB bf16) on a single 16 GB v5e without the TP mesh.

    Params are produced by ``models.mllm.quant.quantize_llm_params`` from a
    ported bf16/fp32 tree; the random init here only serves benchmarks.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]

        def _q_init(key, shape, dtype=jnp.int8):
            return jax.random.randint(key, shape, -127, 128,
                                      jnp.int32).astype(dtype)

        # random-init scale ~ lecun-normal effective weights: uniform ±127
        # ints have std ≈ 73.3, so s = 1 / (73.3 · sqrt(fan_in)).
        def _s_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.full(shape, 1.0 / (73.3 * in_features ** 0.5), dtype)

        q = self.param("kernel_q", _q_init, (in_features, self.features))
        s = self.param("kernel_scale", _s_init, (self.features,))
        y = jnp.dot(x, q.astype(self.dtype))
        return y * s.astype(self.dtype)


class Int4Dense(nn.Module):
    """Weight-only int4 dense, NIBBLE-PACKED (serving-only).

    ``jnp.int4`` stores one byte per element on this runtime (measured
    on-device: 1 Mi s4 elements = 1 MiB), so true 4-bit residency requires
    manual packing. Storage (``ops/int4_matmul.py``): ``kernel_q`` uint8
    ``[in, F'/2]`` — two nibbles per byte in the split-half layout (low
    biased ``q+8``, high two's complement — the shift-free decode encoding,
    see the module docstring) — plus ``kernel_scale`` fp32 ``[in/G, F']``,
    G = gcd(group, in),
    F' the padded feature count (``padded_features``; output is sliced back
    to ``features``). Two lowerings:

    * **decode** (≤16 tokens — the HBM-bandwidth-bound regime int4 targets):
      the Pallas kernel ``int4_decode_matmul`` streams ONLY the packed bytes
      from HBM (~¼ of bf16, ~½ of int8 — and the ms/token in the same
      ratio), unpacking + group-scaling in VMEM. Kernel-ineligible shapes
      (tiny test configs, CPU) use the grouped-einsum fallback with the
      scale outside every dot.
    * **prefill / training shapes**: dequantize per-call then one plain
      matmul — prefill is MXU-bound, so weight bytes don't matter and the
      materialized bf16 operand keeps XLA's tiling optimal.

    Quality: group-wise int4 (AWQ/GPTQ-family layout, PAPERS.md) — per-group
    absmax/7 symmetric. Params from ``quant.quantize_llm_params(bits=4)``.
    Single-chip serving path; the TP mesh rules are written for the int8/bf16
    layouts (a 2-D ``kernel_scale`` under TP shards the group axis — correct
    but not perf-tuned).
    """

    features: int
    group: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import math

        from diffsensei_tpu.ops import int4_matmul as i4

        in_features = x.shape[-1]
        g = i4.group_size(self.group, in_features)
        gn = in_features // g
        padded = i4.padded_features(self.features, in_features, self.group)

        def _q_init(key, shape, dtype=jnp.uint8):
            return jax.random.randint(key, shape, 0, 256,
                                      jnp.int32).astype(dtype)

        # random packed bytes → nibbles uniform in [-8, 7], std ≈ 4.61
        # → lecun-normal-like effective scale
        def _s_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.full(shape, 1.0 / (4.61 * in_features ** 0.5), dtype)

        q = self.param("kernel_q", _q_init, (in_features, padded // 2))
        s = self.param("kernel_scale", _s_init, (gn, padded))
        tokens = math.prod(x.shape[:-1])
        if tokens <= 16:
            x2 = x.reshape(tokens, in_features)
            if (i4.kernel_eligible(in_features, self.group)
                    and jax.default_backend() == "tpu"):
                y = i4.int4_decode_matmul(x2.astype(self.dtype), q, s)
                y = y.astype(self.dtype)
            else:
                y = i4.int4_decode_fallback(x2.astype(self.dtype), q, s)
            return y[..., :self.features].reshape(
                x.shape[:-1] + (self.features,))
        w = i4.dequantize(q, s, dtype=self.dtype)
        return (x @ w)[..., :self.features]


class LoRADense(nn.Module):
    """Dense with optional low-rank adapter (merged at serve time).

    ``quantized`` truthy swaps the base matmul for a weight-only quantized
    dense (QLoRA layout: quantized frozen base, adapters — if any — stay in
    the compute dtype): ``True``/``"int8"`` → :class:`Int8Dense`,
    ``"int4"`` → :class:`Int4Dense`.
    """

    features: int
    lora_rank: int = 0
    lora_alpha: float = 16.0
    use_bias: bool = False
    quantized: Any = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if str(self.quantized) == "int4":
            y = Int4Dense(self.features, dtype=self.dtype, name="base")(x)
        elif self.quantized:
            y = Int8Dense(self.features, dtype=self.dtype, name="base")(x)
        else:
            y = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="base")(x)
        if self.lora_rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02),
                           (x.shape[-1], self.lora_rank), self.param_dtype)
            bq = self.param("lora_b", nn.initializers.zeros,
                            (self.lora_rank, self.features), self.param_dtype)
            scale = self.lora_alpha / self.lora_rank
            y = y + scale * ((x @ a.astype(self.dtype)) @ bq.astype(self.dtype))
        return y


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
        return (norm * w.astype(jnp.float32)).astype(self.dtype)


def rotary_tables(head_dim: int, max_len: int, theta: float):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    freqs = jnp.outer(jnp.arange(max_len, dtype=jnp.float32), inv)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)   # [max_len, head_dim]


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                 positions: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, S, D]; positions: [B, S] absolute positions."""
    c = cos[positions][:, None]       # [B, 1, S, D]
    s = sin[positions][:, None]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s).astype(x.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    lora_rank: int = 0
    quantized: Any = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, positions, attn_bias=None, cache=None,
                 cache_index=None):
        cfg = self.config
        kw = dict(lora_rank=self.lora_rank, quantized=self.quantized,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        b, s, _ = x.shape
        hd = cfg.head_dim

        def heads(t, n):
            return t.reshape(b, s, n, hd).transpose(0, 2, 1, 3)

        q = heads(LoRADense(cfg.num_heads * hd, name="q_proj", **kw)(x),
                  cfg.num_heads)
        k = heads(LoRADense(cfg.num_kv_heads * hd, name="k_proj", **kw)(x),
                  cfg.num_kv_heads)
        v = heads(LoRADense(cfg.num_kv_heads * hd, name="v_proj", **kw)(x),
                  cfg.num_kv_heads)
        q = apply_rotary(q, cos, sin, positions)
        k = apply_rotary(k, cos, sin, positions)

        new_cache = None
        if cache is not None:
            ck, cv = cache    # [B, H, max_len, D]
            k = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                             (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                             (0, 0, cache_index, 0))
            new_cache = (k, v)

        if cfg.num_kv_heads != cfg.num_heads:
            rep = cfg.num_heads // cfg.num_kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        if cache is None:
            o = multi_head_attention(q, k, v, causal=True)
        else:
            # decode: mask keys beyond the written prefix
            klen = k.shape[2]
            kpos = jnp.arange(klen)[None, None, None, :]
            qpos = positions[:, None, :, None]
            bias = jnp.where(kpos <= qpos, 0.0, -1e30).astype(jnp.float32)
            if attn_bias is not None:
                bias = bias + attn_bias
            o = multi_head_attention(q, k, v, bias=bias)

        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.num_heads * hd)
        return LoRADense(cfg.hidden_size, name="o_proj", **kw)(o), new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig
    lora_rank: int = 0
    quantized: Any = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kw = dict(lora_rank=self.lora_rank, quantized=self.quantized,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        g = LoRADense(cfg.intermediate_size, name="gate_proj", **kw)(x)
        u = LoRADense(cfg.intermediate_size, name="up_proj", **kw)(x)
        return LoRADense(cfg.hidden_size, name="down_proj", **kw)(
            nn.silu(g) * u)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    lora_rank: int = 0
    quantized: Any = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, positions, cache=None, cache_index=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkw = dict(quantized=self.quantized, **kw)
        h = RMSNorm(self.config.rms_norm_eps, name="input_norm", **kw)(x)
        a, new_cache = LlamaAttention(self.config, self.lora_rank,
                                      name="attn", **qkw)(
            h, cos, sin, positions, cache=cache, cache_index=cache_index)
        x = x + a
        h = RMSNorm(self.config.rms_norm_eps, name="post_norm", **kw)(x)
        x = x + LlamaMLP(self.config, self.lora_rank, name="mlp", **qkw)(h)
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    """Returns (logits, final_hidden, new_caches).

    ``inputs_embeds`` is first-class (the agent scatters image embeddings into
    token slots before the LLM, reference ``seed_x.py:40-43``); ``caches`` is a
    list of per-layer (k, v) static-size buffers with ``cache_index`` the write
    offset — pass None for full-sequence (training) mode.
    """

    config: LlamaConfig
    lora_rank: int = 0
    remat: bool = False
    # Selective checkpointing for ``remat=True`` (training): "attn" saves the
    # tagged flash outputs (attn_out/attn_lse, ops/flash_attention.py) so the
    # backward reads the saved pair instead of replaying the causal flash
    # forward of every layer — same policy family as
    # ``UNetMangaModel.remat_policy``. None = full recompute.
    remat_policy: Optional[str] = None
    # False | True/"int8" | "int4" — weight-only quantized serving
    quantized: Any = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     name="embed_tokens", **kw)
        layer_cls = LlamaLayer
        if self.remat:
            policy = None
            if self.remat_policy == "attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse")
            layer_cls = nn.remat(LlamaLayer, static_argnums=(),
                                 policy=policy)
        self.layers = [layer_cls(cfg, self.lora_rank,
                                 quantized=self.quantized,
                                 name=f"layers_{i}", **kw)
                       for i in range(cfg.num_layers)]
        self.norm = RMSNorm(cfg.rms_norm_eps, name="norm", **kw)
        if str(self.quantized) == "int4":
            self.lm_head = Int4Dense(cfg.vocab_size, dtype=self.dtype,
                                     name="lm_head")
        elif self.quantized:
            self.lm_head = Int8Dense(cfg.vocab_size, dtype=self.dtype,
                                     name="lm_head")
        else:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    name="lm_head", **kw)

    def __call__(self, input_ids=None, inputs_embeds=None, positions=None,
                 caches=None, cache_index=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds
        b, s, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = rotary_tables(cfg.head_dim, cfg.max_position_embeddings,
                                 cfg.rope_theta)

        new_caches = []
        for idx, layer in enumerate(self.layers):
            cache = None if caches is None else caches[idx]
            x, nc = layer(x, cos, sin, positions, cache, cache_index)
            new_caches.append(nc)
        x = self.norm(x)
        logits = self.lm_head(x)
        return logits, x, (new_caches if caches is not None else None)

    def embed_tokens_only(self, input_ids):
        """Token embedding lookup (agent needs it before scattering)."""
        return self.embed_tokens(input_ids)


def init_caches(cfg: LlamaConfig, batch: int, max_len: int,
                dtype=jnp.float32):
    shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.num_layers)]


def cross_entropy_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          ignore_index: int = -100) -> jnp.ndarray:
    """Shifted LM loss (HF convention: logits[:, :-1] predict labels[:, 1:])."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.clip(
        jnp.sum(valid), 1, None)
