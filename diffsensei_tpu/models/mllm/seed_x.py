"""ContinuousLVLM — the SEED-X agent that adapts character embeddings to text.

Capability match for ``src/models/mllm/seed_x.py:22`` (train forward ``:35-88``,
generate ``:90-171``) and the image-token-ladder LogitsProcessor
(``src/models/mllm/generation.py:10-30``), re-designed for XLA:

* **Static-shape scatter/gather.** The reference scatters resampled image
  tokens into the sequence with boolean fancy-indexing
  (``input_embeds[ids_cmp_mask] = ...``) and gathers generation-slot hidden
  states the same way — data-dependent shapes. Here both become stable-argsort
  permutations + masked selects over fixed shapes, so the whole loss jits.
* **Compiled decode loop.** The reference drives HF ``generate`` one Python
  step per token with a LogitsProcessor that forces the ``<img_0>…<img_63></img>``
  ladder. Here generation is a ``lax.scan`` over a static KV cache, and the
  ladder is a vocab-indexed successor table applied inside the loop:
  ``next = succ[last] if succ[last] >= 0 else argmax(masked_logits)`` — exact
  greedy semantics of the reference processor (which boosts the successor above
  the max score; greedy ⇒ identical choice).
* The MLLM's real output is the **64 hidden states preceding ``</img>``**
  (reference ``:144-156``), resampled by ``output_resampler`` into continuous
  image embeddings — returned as ``img_gen_feat``.

Token conventions (reference ``seed_x.py:10-12``): ``<img>`` begin, ``</img>``
end, ``<img_{k:05d}>`` ladder; ids are supplied by the caller (tokenizer-derived)
as ``ladder_ids = [boi, img_0, …, img_{n-1}, eoi]``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.core.config import AgentConfig
from diffsensei_tpu.models.mllm.llama import (
    LlamaForCausalLM, cross_entropy_lm_loss, init_caches)
from diffsensei_tpu.models.mllm.qwen_resampler import QwenResampler


def _ordered_true_gather(values: jnp.ndarray, mask: jnp.ndarray,
                         count: int) -> jnp.ndarray:
    """Per-row: the first ``count`` elements of ``values`` where mask is True,
    in order (rows with fewer True entries return garbage there — callers mask).

    values: [B, L, D]; mask: [B, L] bool → [B, count, D].
    """
    order = jnp.argsort(~mask, axis=1, stable=True)[:, :count]   # [B, count]
    return jnp.take_along_axis(values, order[..., None], axis=1)


def _ordered_scatter(base: jnp.ndarray, mask: jnp.ndarray,
                     tokens: jnp.ndarray) -> jnp.ndarray:
    """Write tokens[k] into the k-th True position of mask, per row.

    base: [B, L, D]; mask: [B, L]; tokens: [B, K, D] with K >= mask.sum(1).
    """
    slot = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1       # [B, L]
    slot = jnp.clip(slot, 0, tokens.shape[1] - 1)
    gathered = jnp.take_along_axis(tokens, slot[..., None], axis=1)
    return jnp.where(mask[..., None], gathered.astype(base.dtype), base)


@dataclasses.dataclass
class ContinuousLVLM:
    """Bundles the LLM + I/O resamplers with their params (pipeline-style)."""

    config: AgentConfig
    llm: LlamaForCausalLM
    llm_params: Any
    input_resampler: QwenResampler
    input_resampler_params: Any
    output_resampler: QwenResampler
    output_resampler_params: Any

    @classmethod
    def build(cls, config: AgentConfig, rng: jax.Array,
              dtype=jnp.float32, lora_rank: Optional[int] = None,
              remat: bool = False, remat_policy: Optional[str] = None,
              quantized=False,
              abstract: bool = False,
              jit_init: bool = False) -> "ContinuousLVLM":
        """``quantized`` truthy builds the weight-only quantized serving LLM
        (``True``/``"int8"`` per-channel int8, ``"int4"`` group-wise int4;
        random init — real weights come via
        ``models.mllm.quant.quantize_agent`` / ``quantize_llm_params``).

        ``abstract=True`` skips materializing params — trees hold
        ``jax.ShapeDtypeStruct`` leaves for a checkpoint loader to replace.
        The 13B-class LLM cannot be random-initialized on a 16 GB chip (or
        cheaply on host); serving builds abstract, ports host-side, then
        quantizes/ships (``serve/cli.py --quantize-llm``).

        ``jit_init=True`` compiles the three flax inits into ONE program —
        eager init dispatches ~1000 per-op round trips through the axon
        tunnel at SEED-X scale, while the jitted program dead-code-eliminates
        the tracing forward and runs just the initializers. Use for at-scale
        random init (benchmarks); tiny test models skip the compile.
        """
        lora = config.lora.rank if lora_rank is None else lora_rank
        if quantized:
            lora = 0
        llm = LlamaForCausalLM(config.llm, lora_rank=lora, remat=remat,
                               remat_policy=remat_policy, quantized=quantized,
                               dtype=dtype, param_dtype=dtype)
        in_res = QwenResampler(config.input_resampler, dtype=dtype,
                               param_dtype=dtype)
        out_res = QwenResampler(config.output_resampler, dtype=dtype,
                                param_dtype=dtype)
        k1, k2, k3 = jax.random.split(rng, 3)

        def init3():
            llm_params = llm.init(k1, input_ids=jnp.zeros((1, 8), jnp.int32))
            in_params = in_res.init(
                k2, jnp.zeros((1, 4, config.input_resampler.kv_dim or
                               config.input_resampler.embed_dim)))
            out_params = out_res.init(
                k3, jnp.zeros((1, 4, config.output_resampler.kv_dim or
                               config.output_resampler.embed_dim)))
            return llm_params, in_params, out_params

        if abstract:
            llm_params, in_params, out_params = jax.eval_shape(init3)
        elif jit_init:
            llm_params, in_params, out_params = jax.jit(init3)()
        else:
            llm_params, in_params, out_params = init3()
        return cls(config, llm, llm_params, in_res, in_params,
                   out_res, out_params)

    # -- training forward (reference seed_x.py:35-88) --------------------------
    def loss(self, params: Dict[str, Any], batch: Dict[str, jnp.ndarray]
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Pure loss over ``params = {"llm", "input_resampler", "output_resampler"}``.

        batch:
          input_ids / labels: [B, L] (labels -100 outside supervision);
          image_embeds: [B, n_img, S_img, D_in] character embedding blocks;
          embeds_cmp_mask / embeds_gen_mask: [B, n_img] bool;
          ids_cmp_mask / ids_gen_mask: [B, L] bool (nq slots per image).
        """
        cfg = self.config
        nq_in = cfg.input_resampler.num_queries
        nq_out = cfg.output_resampler.num_queries
        b, n_img = batch["embeds_cmp_mask"].shape
        img = batch["image_embeds"]
        s_img, d_in = img.shape[-2:]

        # 1. resample every image block through the input resampler
        img_lm = self.input_resampler.apply(
            params["input_resampler"], img.reshape(b * n_img, s_img, d_in))
        img_lm = img_lm.reshape(b, n_img, nq_in, -1)

        # 2. order cmp rows first, flatten, scatter into the token stream
        row_order = jnp.argsort(~batch["embeds_cmp_mask"], axis=1, stable=True)
        cmp_tokens = jnp.take_along_axis(
            img_lm, row_order[..., None, None], axis=1)
        cmp_tokens = cmp_tokens.reshape(b, n_img * nq_in, -1)

        input_embeds = self.llm.apply(
            params["llm"], batch["input_ids"],
            method=self.llm.embed_tokens_only)
        input_embeds = _ordered_scatter(input_embeds, batch["ids_cmp_mask"],
                                        cmp_tokens)

        # 3. LLM forward → lm loss
        logits, hidden, _ = self.llm.apply(
            params["llm"], inputs_embeds=input_embeds)
        lm_loss = cross_entropy_lm_loss(logits, batch["labels"])

        # 4. rec loss: gen-slot hiddens → output resampler → match the target
        gen_hidden = _ordered_true_gather(hidden, batch["ids_gen_mask"], nq_in)
        recon = self.output_resampler.apply(params["output_resampler"],
                                            gen_hidden)          # [B, nq_out, D]
        tgt_order = jnp.argsort(~batch["embeds_gen_mask"], axis=1, stable=True)
        target = jnp.take_along_axis(img, tgt_order[:, :1, None, None],
                                     axis=1)[:, 0]               # [B, S_img, D]
        target = jax.lax.stop_gradient(target[:, :nq_out])
        valid = (batch["embeds_gen_mask"].sum(axis=1) > 0) & \
                (batch["ids_gen_mask"].sum(axis=1) >= nq_in)
        err = jnp.square(recon.astype(jnp.float32) -
                         target.astype(jnp.float32)).mean(axis=(1, 2))
        rec_loss = jnp.sum(jnp.where(valid, err, 0.0)) / jnp.clip(
            jnp.sum(valid), 1, None)

        total = cfg.lm_loss_scale * lm_loss + cfg.rec_loss_scale * rec_loss
        return total, {"lm_loss": lm_loss, "rec_loss": rec_loss,
                       "recon_image_embeds": recon}

    # -- generation (reference seed_x.py:90-171 + generation.py) ---------------
    def generate(self, input_ids: np.ndarray,
                 image_embeds: Optional[jnp.ndarray] = None,
                 ids_cmp_mask: Optional[jnp.ndarray] = None,
                 ladder_ids: Optional[np.ndarray] = None,
                 max_new_tokens: int = 120,
                 eos_token_id: int = 2,
                 kv_sharding: Optional[Any] = None) -> Dict[str, Any]:
        """Greedy decode with the forced image-token ladder.

        ``kv_sharding``: optional ``NamedSharding`` for the static KV cache —
        under tensor parallelism pass heads-on-``model``
        (``P(None, "model", None, None)``) so the cache shards with the
        column-parallel k/v projections instead of gathering per step; the
        13B-class SEED-X LLM only fits v5e chips with this layout
        (``parallel/mesh.llm_param_sharding_rules``).

        Returns {"output_ids": [B, max_new], "img_gen_feat": [n, nq_out, D] or
        None, "num_gen_imgs": int}.
        """
        cfg = self.config
        nq_in = cfg.input_resampler.num_queries
        params = {"llm": self.llm_params,
                  "input_resampler": self.input_resampler_params,
                  "output_resampler": self.output_resampler_params}
        input_ids = jnp.asarray(input_ids, jnp.int32)
        b, prompt_len = input_ids.shape
        max_len = prompt_len + max_new_tokens

        # successor table + "not-spontaneous" mask from the ladder ids
        vocab = cfg.llm.vocab_size
        succ = np.full((vocab,), -1, np.int32)
        ladder = np.asarray(ladder_ids, np.int64)
        succ[ladder[:-1]] = ladder[1:]
        spont_mask = np.zeros((vocab,), bool)
        spont_mask[ladder[1:]] = True        # img_k and EOI never spontaneous
        succ = jnp.asarray(succ)
        spont_mask = jnp.asarray(spont_mask)

        input_embeds = self.llm.apply(params["llm"], input_ids,
                                      method=self.llm.embed_tokens_only)
        if image_embeds is not None:
            n_img = image_embeds.shape[0] // b if image_embeds.ndim == 3 else \
                image_embeds.shape[1]
            img = image_embeds.reshape(b * n_img, *image_embeds.shape[-2:])
            img_lm = self.input_resampler.apply(params["input_resampler"], img)
            img_lm = img_lm.reshape(b, n_img * nq_in, -1)
            input_embeds = _ordered_scatter(input_embeds, ids_cmp_mask, img_lm)

        out_ids, hiddens = _greedy_decode(
            self.llm, params["llm"], input_embeds, input_ids[:, -1],
            prompt_len, max_len, succ, spont_mask, kv_sharding)
        out_ids = np.asarray(out_ids)          # [B, max_new]
        hiddens = np.asarray(hiddens)          # [B, max_new, dim]

        # collect the nq hidden states before each </img> (reference :144-156)
        eoi = int(ladder[-1])
        feats = []
        for row_ids, row_h in zip(out_ids, hiddens):
            for idx in np.where(row_ids == eoi)[0]:
                if idx >= nq_in:
                    feats.append(row_h[idx - nq_in:idx])
        if feats:
            stacked = jnp.asarray(np.stack(feats))
            img_gen_feat = self.output_resampler.apply(
                params["output_resampler"], stacked)
        else:
            img_gen_feat = None
        return {"output_ids": out_ids, "img_gen_feat": img_gen_feat,
                "num_gen_imgs": len(feats)}


@functools.partial(jax.jit, static_argnames=("llm", "prompt_len", "max_len",
                                             "kv_sharding"))
def _greedy_decode(llm, llm_params, input_embeds, last_prompt_token,
                   prompt_len: int, max_len: int, succ, spont_mask,
                   kv_sharding=None):
    """Prefill + lax.scan greedy decode; returns (new_ids, new_hiddens).

    ``ids[k]`` is the k-th generated token; ``hiddens[k]`` is the LLM hidden
    state OF that token (the state that predicts token k+1) — the alignment
    the reference's ``</img>``-window extraction assumes (``seed_x.py:144-156``).

    ``kv_sharding`` (static NamedSharding): pins the KV-cache layout under TP
    so the head axis stays sharded through the scan carry.
    """
    b = input_embeds.shape[0]
    dtype = input_embeds.dtype
    caches = init_caches(llm.config, b, max_len, dtype)
    if kv_sharding is not None:
        caches = [(jax.lax.with_sharding_constraint(k, kv_sharding),
                   jax.lax.with_sharding_constraint(v, kv_sharding))
                  for k, v in caches]

    positions = jnp.broadcast_to(jnp.arange(prompt_len)[None], (b, prompt_len))
    logits, hidden, caches = llm.apply(
        llm_params, inputs_embeds=input_embeds, positions=positions,
        caches=caches, cache_index=0)

    def pick(last_token, logits_row):
        forced = succ[last_token]
        masked = jnp.where(spont_mask[None, :], 0.0,
                           logits_row.astype(jnp.float32))
        free = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        return jnp.where(forced >= 0, forced, free)

    # prompts typically end with <img>, which forces <img_0> here
    first = pick(last_prompt_token, logits[:, -1])

    def body(carry, i):
        token, caches = carry
        emb = llm.apply(llm_params, token[:, None],
                        method=llm.embed_tokens_only)
        pos = jnp.full((b, 1), prompt_len, jnp.int32) + i
        logits, hidden, caches = llm.apply(
            llm_params, inputs_embeds=emb, positions=pos,
            caches=caches, cache_index=prompt_len + i)
        nxt = pick(token, logits[:, -1])
        return (nxt, caches), (token, hidden[:, 0])

    max_new = max_len - prompt_len
    (last, _), (ids, hiddens) = jax.lax.scan(
        body, (first, caches), jnp.arange(max_new))
    # ids[k] is the token CHOSEN at step k (first generated token at k=0);
    # hiddens[k] is the hidden state that produced token k+1 — shift so
    # hiddens align with ids as in the reference (hidden of each generated
    # position).
    ids = jnp.moveaxis(ids, 0, 1)              # [B, max_new]
    hiddens = jnp.moveaxis(hiddens, 0, 1)      # [B, max_new, dim]
    return ids, hiddens
