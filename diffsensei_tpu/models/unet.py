"""TPU-native SDXL UNet with manga conditioning hooks.

Re-implements the capabilities of the reference ``UNetMangaModel``
(``src/models/unet.py:43``) — an SDXL ``UNet2DConditionModel`` whose cross-attention
processors are swapped for masked IP-Adapter processors
(``src/models/attention_processor.py:99``) and which pastes a learned dialog-layout
embedding onto the post-conv_in features (``src/models/unet.py:86-114,209-210``) —
with a TPU-first structure:

* **Context stays split.** The reference concatenates ``[text ‖ dummy ‖ ip]`` into one
  tensor and re-splits it inside every processor (``attention_processor.py:213-217``);
  here text tokens and IP tokens are separate arguments, so the two attention streams
  (frozen text cross-attn, trainable IP cross-attn) are explicit matmuls with no
  slicing in the hot path.
* **Masks are hoisted.** The reference rebuilds the bbox attention mask with Python
  loops inside every cross-attn layer on every denoise step
  (``attention_processor.py:115-169,243``). The mask depends only on (bbox, h, w),
  so the pipeline precomputes one additive bias per attention resolution level
  (``ops/masked_ip.build_ip_attention_bias``) and the UNet just indexes it.
* **Static spatial shapes.** The reference re-derives (h, w) from the flattened
  sequence length by integer search per layer (``attention_processor.py:131-139``);
  here NHWC shapes are static under jit, so (h, w) is known at trace time.
* **NHWC + bf16** throughout; fp32 accumulation in attention and norms.

Layout of the IP context (matches the reference Resampler output,
``src/models/resampler.py:136-140``): ``[num_dummy_tokens ‖ char0 tokens ‖ …]``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from diffsensei_tpu.core.config import UNetConfig
from diffsensei_tpu.models.lora import LoRADense
from diffsensei_tpu.models.layers import (
    Downsample2D,
    GEGLUFeedForward,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)
from diffsensei_tpu.ops.attention import multi_head_attention
from diffsensei_tpu.ops.masked_ip import rasterize_dialog_embedding

Dtype = Any


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class SelfAttention(nn.Module):
    """Spatial self-attention (reference ``AttnProcessor2_0``,
    ``src/models/attention_processor.py:7-96``). ``lora_rank>0`` adds
    low-rank adapters on every projection (reference ``train.py:162-174``
    peft targets ``to_k/to_q/to_v/to_out.0`` in all attention modules)."""

    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    quantized: bool = False
    # context parallelism (serving, opt-in): shard the spatial sequence over
    # ``cp_axis`` of ``cp_mesh`` and run ring-flash attention when the
    # sequence is at least ``cp_min_seq`` tokens (SURVEY §5 long-context:
    # 2048²-class panels). None = single-device attention (default).
    cp_mesh: Any = None
    cp_axis: str = "data"
    cp_min_seq: int = 16384

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        dense = lambda name: LoRADense(dim, lora_rank=self.lora_rank,
                                       use_bias=False, dtype=self.dtype,
                                       quantized=self.quantized,
                                       param_dtype=self.param_dtype, name=name)
        q = _split_heads(dense("to_q")(x), self.heads)
        k = _split_heads(dense("to_k")(x), self.heads)
        v = _split_heads(dense("to_v")(x), self.heads)
        cp = self.cp_mesh is not None and x.shape[1] >= self.cp_min_seq
        o = _merge_heads(multi_head_attention(
            q, k, v, cp_mesh=self.cp_mesh if cp else None,
            cp_axis=self.cp_axis))
        return LoRADense(dim, lora_rank=self.lora_rank, dtype=self.dtype,
                         quantized=self.quantized,
                         param_dtype=self.param_dtype, name="to_out")(o)


class MangaCrossAttention(nn.Module):
    """Dual-stream cross-attention: text tokens + spatially-masked IP tokens.

    Math of the reference ``MaskedIPAttnProcessor2_0``
    (``src/models/attention_processor.py:99-273``): one query projection, a standard
    attention over text keys/values, a second attention over IP keys/values produced
    by separate ``to_k_ip``/``to_v_ip`` projections (initialized from the frozen
    ``to_k``/``to_v`` at porting time, reference ``unet.py:72-82``) under the
    precomputed bbox bias, combined as ``text_attn + ip_scale * ip_attn`` before the
    output projection (reference combine at ``attention_processor.py:258``).
    """

    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx_text: jnp.ndarray,
                 ctx_ip: Optional[jnp.ndarray] = None,
                 ip_bias: Optional[jnp.ndarray] = None,
                 ip_scale: jnp.ndarray | float = 1.0) -> jnp.ndarray:
        dim = x.shape[-1]
        # LoRA wraps the frozen base projections only; the IP projections
        # (to_k_ip/to_v_ip) are already the trainable "new" params and the
        # reference peft targets exclude them (suffix match on to_k/to_q/
        # to_v/to_out.0, train.py:171-173)
        dense = lambda name: LoRADense(dim, lora_rank=self.lora_rank,
                                       use_bias=False, dtype=self.dtype,
                                       quantized=self.quantized,
                                       param_dtype=self.param_dtype, name=name)
        ip_dense = lambda name: (
            LoRADense(dim, use_bias=False, quantized=True, dtype=self.dtype,
                      param_dtype=self.param_dtype, name=name)
            if self.quantized else
            nn.Dense(dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=name))
        q = _split_heads(dense("to_q")(x), self.heads)
        k = _split_heads(dense("to_k")(ctx_text), self.heads)
        v = _split_heads(dense("to_v")(ctx_text), self.heads)
        h = multi_head_attention(q, k, v)

        if ctx_ip is not None:
            k_ip = _split_heads(ip_dense("to_k_ip")(ctx_ip), self.heads)
            v_ip = _split_heads(ip_dense("to_v_ip")(ctx_ip), self.heads)
            bias = None if ip_bias is None else ip_bias[:, None, :, :]
            h_ip = multi_head_attention(q, k_ip, v_ip, bias=bias)
            h = h + jnp.asarray(ip_scale, h.dtype) * h_ip

        o = _merge_heads(h)
        return LoRADense(dim, lora_rank=self.lora_rank, dtype=self.dtype,
                         quantized=self.quantized,
                         param_dtype=self.param_dtype, name="to_out")(o)


class BasicTransformerBlock(nn.Module):
    """self-attn → manga cross-attn → GEGLU FFN, each pre-LayerNorm + residual."""

    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    quantized: bool = False
    cp_mesh: Any = None
    cp_axis: str = "data"
    cp_min_seq: int = 16384

    @nn.compact
    def __call__(self, x, ctx_text, ctx_ip, ip_bias, ip_scale):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = x + SelfAttention(self.heads, self.dtype, self.param_dtype,
                              lora_rank=self.lora_rank,
                              quantized=self.quantized,
                              cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
                              cp_min_seq=self.cp_min_seq,
                              name="attn1")(ln("norm1")(x))
        x = x + MangaCrossAttention(self.heads, self.dtype, self.param_dtype,
                                    lora_rank=self.lora_rank,
                                    quantized=self.quantized,
                                    name="attn2")(
            ln("norm2")(x), ctx_text, ctx_ip, ip_bias, ip_scale)
        x = x + GEGLUFeedForward(x.shape[-1], dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quantized=self.quantized,
                                 name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """SDXL-style spatial transformer: GroupNorm → linear in → N blocks → linear out.

    Blocks are Python-unrolled, NOT ``nn.scan``-stacked: measured on v5e
    (2026-08, full SDXL UNet at 1024²), scanning the repeated blocks regressed
    BOTH steady-state (57→65 ms per UNet forward — scan blocks XLA's
    cross-block fusion/pipelining) AND compile time (TTF 1163→1568 s), so the
    unrolled form is strictly better on this hardware.
    """

    num_layers: int
    heads: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    quantized: bool = False
    cp_mesh: Any = None
    cp_axis: str = "data"
    cp_min_seq: int = 16384

    @nn.compact
    def __call__(self, x, ctx_text, ctx_ip, ip_bias, ip_scale):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm")(x)
        x = x.reshape(b, h * w, c)
        proj = lambda name: (
            LoRADense(c, quantized=True, dtype=self.dtype,
                      param_dtype=self.param_dtype, name=name)
            if self.quantized else
            nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name=name))
        x = proj("proj_in")(x)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.heads, self.dtype, self.param_dtype,
                                      lora_rank=self.lora_rank,
                                      quantized=self.quantized,
                                      cp_mesh=self.cp_mesh,
                                      cp_axis=self.cp_axis,
                                      cp_min_seq=self.cp_min_seq,
                                      name=f"blocks_{i}")(
                x, ctx_text, ctx_ip, ip_bias, ip_scale)
        x = proj("proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class UNetMangaModel(nn.Module):
    """SDXL UNet with masked-IP cross-attention and dialog-layout embedding.

    Args to ``__call__``:
      sample: [B, H, W, in_channels] NHWC latents.
      timesteps: [B] (or scalar) diffusion timesteps.
      encoder_hidden_states: [B, T_text, cross_attention_dim] text context.
      pooled_text_embeds: [B, pooled_projection_dim] (SDXL add-embeds).
      time_ids: [B, 6] SDXL micro-conditioning (orig/crop/target sizes).
      ip_hidden_states: [B, D + I*V, cross_attention_dim] manga tokens
        (dummy block first), or None to disable IP conditioning.
      ip_attn_bias: dict {level_index: [B, S_level, D + I*V]} additive biases from
        ``build_ip_attention_bias`` at each attention resolution, or None.
      ip_scale: IP stream weight (reference runtime knob,
        ``pipeline_diffsensei.py:172-178``).
      dialog_bbox: [B, max_num_dialogs, 4] relative bboxes, or None.

    Returns the predicted noise, [B, H, W, out_channels].
    """

    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # per-block rematerialization: backward recomputes each resnet/transformer
    # block instead of stashing its activations — required to fit 1024²
    # training on one 16 GB chip (outer jax.checkpoint alone does not bound
    # the backward's peak memory)
    remat_blocks: bool = False
    # selective-checkpoint policy for the TRANSFORMER blocks (resnets always
    # fully remat — their conv activations dominate memory at levels 0-1):
    #   None            full recompute (lowest memory; the 16 GB default)
    #   "dots_deepest"  save matmul outputs (qkv/out/GEGLU) in the deepest
    #                   level's blocks only — 60 of 70 attention layers live
    #                   there but their seq is the shortest, so the saved
    #                   tensors are small while the pruned replay is most of
    #                   the transformer fwd
    #   "dots"          save matmul outputs in every transformer block —
    #                   measured best wherever it fits (512² full-tune
    #                   131.9→115.2 ms; 1024² partitioned stage-2 379→349 ms);
    #                   1024² FULL fine-tune still needs full recompute
    #   "attn"          save only the tagged attention outputs (attn_out +
    #                   flash lse, ops/flash_attention.py) — prunes the
    #                   replayed Pallas flash forwards from the backward at
    #                   ~2 MB/attention, a fraction of "dots"' footprint; the
    #                   option for 1024² FULL fine-tune where "dots" OOMs
    #   "dots_attn"     both policies combined — strictly less replay than
    #                   "dots" wherever "dots" fits
    remat_policy: Optional[str] = None
    # context-parallel serving (opt-in, SURVEY §5 long-context): when set,
    # spatial self-attentions with >= cp_min_seq tokens run as ring-flash
    # attention with the sequence sharded over cp_axis of cp_mesh
    # (ops/ring_attention.py). Reached from DiffSenseiPipeline via
    # PipelineConfig.context_parallel; forward/serving only.
    cp_mesh: Any = None
    cp_axis: str = "data"
    cp_min_seq: int = 16384
    # weight-only int8 for every transformer matmul (qkv/out/ip/GEGLU/
    # proj_in/out — 4.75 of the 5.42 GiB bf16 tree at SDXL geometry, so the
    # resident UNet drops to ~3.0 GiB): the serving lever that lets the
    # diffusion stack CO-RESIDE with the SEED-X agent on one 16 GB v5e
    # (reference loads both on one device, scripts/demo/gradio.py:255-283).
    # Convs/norms/time-embeddings stay in the compute dtype. Params come from
    # models.quant_unet.quantize_unet_params; serving-only.
    quantized: bool = False

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 pooled_text_embeds, time_ids,
                 ip_hidden_states=None, ip_attn_bias=None,
                 ip_scale: jnp.ndarray | float = 1.0,
                 dialog_bbox=None,
                 deep_feature=None, cache_split: int = 2,
                 return_deep: bool = False):
        """Deep-feature caching (DeepCache-family, arXiv:2312.03209 /
        2312.09608 lineage — denoise features at the inner UNet levels drift
        slowly across adjacent steps, so most steps can reuse them):

        * ``return_deep=True`` additionally returns the up-path feature just
          after it is upsampled back to level ``cache_split - 1`` resolution —
          the output of the "deep subtree" (down levels >= cache_split, mid,
          up levels >= cache_split).
        * ``deep_feature`` (from a previous step's ``return_deep``) skips that
          whole subtree and splices the cached feature into the up path.

        Exactness contract: ``full(x)[0] == apply(x, deep_feature=full(x)[1])``
        bit-for-bit — caching across steps is the only approximation. At SDXL
        geometry ``cache_split=2`` skips 60 of the 70 transformer layers and
        the 32² resnets while keeping every masked-IP level-1 cross-attention
        live each step. Serving knob: ``DiffSenseiPipeline(...,
        deep_cache_interval=N)``; OPT-IN — quality/fidelity is approximate for
        N > 1 (the reference has no counterpart)."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        tkw = dict(kw, lora_rank=cfg.lora_rank, quantized=self.quantized,
                   cp_mesh=self.cp_mesh,
                   cp_axis=self.cp_axis, cp_min_seq=self.cp_min_seq)
        ResBlock = nn.remat(ResnetBlock2D) if self.remat_blocks \
            else ResnetBlock2D
        n_deepest = len(cfg.block_out_channels) - 1

        def tfm_block(level):
            if not self.remat_blocks:
                return Transformer2D
            import jax
            dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            attn = jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse")
            if self.remat_policy == "dots" or (
                    self.remat_policy == "dots_deepest" and level == n_deepest):
                return nn.remat(Transformer2D, policy=dots)
            if self.remat_policy == "attn":
                return nn.remat(Transformer2D, policy=attn)
            if self.remat_policy == "dots_attn":
                return nn.remat(
                    Transformer2D,
                    policy=jax.checkpoint_policies.save_from_both_policies(
                        dots, attn))
            return nn.remat(Transformer2D)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # --- time + SDXL micro-conditioning embeddings (reference unet.py:190-199)
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.time_embed_dim, name="time_embedding",
                                 **kw)(temb.astype(self.dtype))
        tid = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        tid = tid.reshape(time_ids.shape[0], -1)
        add = jnp.concatenate(
            [pooled_text_embeds.astype(jnp.float32), tid], axis=-1)
        temb = temb + TimestepEmbedding(cfg.time_embed_dim, name="add_embedding",
                                        **kw)(add.astype(self.dtype))

        # --- conv_in + dialog-layout embedding (reference unet.py:206-210)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in", **kw)(sample.astype(self.dtype))
        if cfg.use_dialog_embedding:
            dialog_embedding = self.param(
                "dialog_bbox_embedding", nn.initializers.zeros,
                (cfg.block_out_channels[0],), self.param_dtype)
            if dialog_bbox is not None:
                x = rasterize_dialog_embedding(x, dialog_bbox, dialog_embedding)

        def attn_args(level):
            bias = None
            if ip_attn_bias is not None and ip_hidden_states is not None:
                bias = ip_attn_bias.get(level)
            return (encoder_hidden_states.astype(self.dtype),
                    None if ip_hidden_states is None
                    else ip_hidden_states.astype(self.dtype),
                    bias, ip_scale)

        n_levels = len(cfg.block_out_channels)
        tlayers = cfg.transformer_layers_per_block
        use_cache = deep_feature is not None
        if (use_cache or return_deep) and not 1 <= cache_split < n_levels:
            raise ValueError(f"cache_split must be in [1, {n_levels - 1}], "
                             f"got {cache_split}")

        # --- down path (reference unet.py:244-265); with a cached deep
        # feature only the shallow levels (< cache_split) run
        skips = [x]
        for level in range(cache_split if use_cache else n_levels):
            ch = cfg.block_out_channels[level]
            heads = ch // cfg.head_dim
            for j in range(cfg.layers_per_block):
                x = ResBlock(ch, cfg.norm_num_groups,
                                  name=f"down_{level}_resnet_{j}", **kw)(x, temb)
                if tlayers[level] > 0:
                    x = tfm_block(level)(
                        tlayers[level], heads, cfg.norm_num_groups,
                        name=f"down_{level}_attn_{j}", **tkw)(
                        x, *attn_args(level))
                skips.append(x)
            if level < n_levels - 1 and not (use_cache
                                             and level == cache_split - 1):
                # the level-(split-1) downsample feeds only the skipped
                # subtree (its skip is consumed inside it too)
                x = Downsample2D(ch, name=f"down_{level}_downsample", **kw)(x)
                skips.append(x)

        deep_out = None
        if not use_cache:
            # --- mid block (reference unet.py:279-298)
            mid_ch = cfg.block_out_channels[-1]
            x = ResBlock(mid_ch, cfg.norm_num_groups,
                              name="mid_resnet_0", **kw)(x, temb)
            x = tfm_block(n_levels - 1)(
                cfg.mid_transformer_layers, mid_ch // cfg.head_dim,
                cfg.norm_num_groups, name="mid_attn", **tkw)(
                x, *attn_args(n_levels - 1))
            x = ResBlock(mid_ch, cfg.norm_num_groups,
                              name="mid_resnet_1", **kw)(x, temb)
        else:
            x = deep_feature.astype(self.dtype)

        # --- up path (reference unet.py:304-332); rev numbering (and so
        # param names) always counts from the deepest level
        for rev, level in enumerate(reversed(range(n_levels))):
            if use_cache and level >= cache_split:
                continue
            ch = cfg.block_out_channels[level]
            heads = ch // cfg.head_dim
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResBlock(ch, cfg.norm_num_groups,
                                  name=f"up_{rev}_resnet_{j}", **kw)(x, temb)
                if tlayers[level] > 0:
                    x = tfm_block(level)(
                        tlayers[level], heads, cfg.norm_num_groups,
                        name=f"up_{rev}_attn_{j}", **tkw)(
                        x, *attn_args(level))
            if level > 0:
                # land exactly on the next skip's (h, w): odd feature sizes
                # (legal at any multiple-of-8 panel edge) don't round-trip
                # through stride-2 down + x2 up (diffusers forwards
                # upsample_size the same way at unet forward :304-332)
                x = Upsample2D(ch, name=f"up_{rev}_upsample", **kw)(
                    x, output_size=skips[-1].shape[1:3])
                if return_deep and level == cache_split:
                    deep_out = x

        # --- output head (reference unet.py:335-338)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         name="conv_norm_out", **kw)(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)
        if return_deep:
            # a cached call skips the capture point — pass the cache through
            return x, (deep_feature if deep_out is None else deep_out)
        return x


def attention_levels(cfg: UNetConfig) -> Tuple[int, ...]:
    """Level indices that contain cross-attention (need an IP bias entry)."""
    return tuple(i for i, t in enumerate(cfg.transformer_layers_per_block) if t > 0)


def level_spatial_shape(cfg: UNetConfig, height: int, width: int,
                        level: int) -> Tuple[int, int]:
    """Feature-map (h, w) of a UNet level for a given latent (height, width).

    Stride-2 SAME-padded downsampling yields ``ceil(h/2)`` per level (equal to
    ``h >> level`` only when every intermediate size is even) — the reference
    recovers the same shapes by integer search at
    ``attention_processor.py:131-139``."""
    return -(-height // (1 << level)), -(-width // (1 << level))
