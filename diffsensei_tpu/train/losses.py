"""Training losses for the three-stage DiffSensei recipe.

* ``diffusion_loss`` — epsilon-prediction MSE (``scripts/train/train.py:418``,
  ``train_t2i.py:297``).
* ``mean_multiple_ip_embeds`` — average each character's token block over its
  valid source crops (``scripts/train/train.py:43-62``).
* ``ip_contrastive_loss`` — **the component the reference lost**: ``train.py:33``
  imports ``compute_ip_contrastive_loss{,_slow}`` from ``src/models/utils.py``
  where they do not exist (import crash; SURVEY.md "known defects"). The config
  hooks survive (``configs/train/diffsensei/self_0.5.yaml:23-24``: mode
  ``fast|slow|null`` + weight) and the call site passes the per-source resampled
  IP tokens plus ``ip_exists`` (``train.py:372-377``). Reconstructed semantics:
  a symmetric InfoNCE over per-(sample, character) features where views of the
  SAME character from different source crops are positives and everything else
  in the batch is negative — pulling the resampler toward source-invariant
  character identity. ``fast`` pools tokens before the similarity matrix;
  ``slow`` computes token-level similarities then pools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_l2_normalize(f: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize with a gradient that is finite at ``f == 0``.

    ``f / clip(norm(f), eps)`` matches torch ``F.normalize`` forward, but in
    JAX ``d norm/df`` at f=0 is 0/0 = NaN and ``clip``'s zero cotangent
    multiplies it as 0*NaN = NaN — one all-zero pooled character feature
    (padded sample, zeros-init smoke run) NaN-poisons every upstream
    parameter after a single optimizer step. torch defines the norm
    subgradient at 0 as 0, so the reference never trips this. Folding the
    floor INSIDE the sqrt keeps the chain finite everywhere; for
    ``norm >> 1e-6`` the two forms agree to well below bf16 resolution."""
    sumsq = jnp.sum(jnp.square(f), axis=-1, keepdims=True)
    return f * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))


def diffusion_loss(noise_pred: jnp.ndarray, noise: jnp.ndarray,
                   sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Epsilon MSE; ``sample_mask`` [B] masks padded batch rows (the TPU build
    pads partial bucket batches with repeats instead of the reference's
    pseudo-sample filtering, ``dataset_size_bucket.py:303-306``)."""
    err = jnp.square(noise_pred.astype(jnp.float32) - noise.astype(jnp.float32))
    if sample_mask is None:
        return jnp.mean(err)
    per_sample = err.mean(axis=tuple(range(1, err.ndim)))
    m = sample_mask.astype(jnp.float32)
    return jnp.sum(per_sample * m) / jnp.clip(jnp.sum(m), 1.0, None)


def mean_multiple_ip_embeds(
    image_embeds: jnp.ndarray,
    ip_exists: jnp.ndarray,
    num_dummy_tokens: int,
    max_num_ips: int,
    num_vision_tokens: int,
    bsz: int,
) -> jnp.ndarray:
    """Average per-character token blocks over valid sources.

    Args:
      image_embeds: [bsz * max_sources, dummy + max_ips*V, D] resampler output,
        sources-major layout (reference ``train.py:358-362``).
      ip_exists: [bsz, max_ips, max_sources] validity mask.

    Returns [bsz, dummy + max_ips*V, D]: dummy block from source 0, character
    blocks averaged over valid sources (sum / clamp(count, 1), ``train.py:53-57``).
    """
    d = image_embeds.shape[-1]
    n_sources = image_embeds.shape[0] // bsz
    ip = image_embeds[:, num_dummy_tokens:, :]
    ip = ip.reshape(bsz, n_sources, max_num_ips, num_vision_tokens, d)
    ip = ip.transpose(0, 2, 1, 3, 4)             # [B, I, S, V, D]

    mask = ip_exists.astype(ip.dtype)[..., None, None]   # [B, I, S, 1, 1]
    summed = jnp.sum(ip * mask, axis=2)                   # [B, I, V, D]
    count = jnp.clip(jnp.sum(mask, axis=2), 1.0, None)
    mean = (summed / count).reshape(bsz, max_num_ips * num_vision_tokens, d)

    first_source = image_embeds.reshape(
        bsz, n_sources, -1, d)[:, 0]
    return jnp.concatenate(
        [first_source[:, :num_dummy_tokens], mean], axis=1)


def _char_features(ip_embeds: jnp.ndarray, bsz: int, max_num_ips: int,
                   num_vision_tokens: int) -> jnp.ndarray:
    """[bsz*S, I*V, D] → L2-normalized [bsz, I, S, D] (tokens mean-pooled)."""
    d = ip_embeds.shape[-1]
    n_sources = ip_embeds.shape[0] // bsz
    f = ip_embeds.reshape(bsz, n_sources, max_num_ips, num_vision_tokens, d)
    f = f.transpose(0, 2, 1, 3, 4).mean(axis=3)           # [B, I, S, D]
    return _safe_l2_normalize(f)


def ip_contrastive_loss(
    ip_embeds: jnp.ndarray,
    ip_exists: jnp.ndarray,
    bsz: int,
    max_num_ips: int,
    num_vision_tokens: int,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """InfoNCE over (sample, character) identities across source views.

    Args:
      ip_embeds: [bsz * max_sources, max_ips * V, D] — the resampler output
        minus the dummy block (call-site slice, reference ``train.py:373``).
      ip_exists: [bsz, max_ips, max_sources].

    Views of one character anchor each other as positives; all other
    (sample, character) views are negatives. Invalid (padded) views are masked
    from both sides. Returns a scalar; 0.0 when no positive pair exists.
    """
    f = _char_features(ip_embeds, bsz, max_num_ips, num_vision_tokens)
    b, i, s, d = f.shape
    n = b * i * s
    views = f.reshape(n, d).astype(jnp.float32)
    valid = ip_exists.transpose(0, 1, 2).reshape(n) > 0    # [N]

    ident = jnp.arange(b * i).repeat(s)                    # class id per view
    sim = views @ views.T / temperature                    # [N, N]

    same_class = ident[:, None] == ident[None, :]
    eye = jnp.eye(n, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & ~eye
    pos_mask = same_class & pair_valid
    neg_inf = jnp.asarray(-1e9, sim.dtype)

    # log p(positive j | anchor a) over all valid non-self candidates
    logits = jnp.where(pair_valid, sim, neg_inf)
    log_denom = jax.nn.logsumexp(logits, axis=1)
    log_num = jnp.where(pos_mask, sim, neg_inf)
    # average over positives per anchor (multi-positive InfoNCE)
    per_pos = -(log_num - log_denom[:, None])
    n_pos = jnp.sum(pos_mask, axis=1)
    anchor_loss = jnp.sum(jnp.where(pos_mask, per_pos, 0.0), axis=1) / jnp.clip(
        n_pos, 1, None)
    has_pos = n_pos > 0
    total = jnp.sum(jnp.where(has_pos, anchor_loss, 0.0))
    return total / jnp.clip(jnp.sum(has_pos), 1, None)


def ip_contrastive_loss_slow(
    ip_embeds: jnp.ndarray,
    ip_exists: jnp.ndarray,
    bsz: int,
    max_num_ips: int,
    num_vision_tokens: int,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Token-level variant (reference's ``_slow``): similarity between two views
    is the mean over the token-pair similarity matrix, then the same InfoNCE.
    Kept for config parity (``ip_contrastive_loss: slow``)."""
    d = ip_embeds.shape[-1]
    n_sources = ip_embeds.shape[0] // bsz
    f = ip_embeds.reshape(bsz, n_sources, max_num_ips, num_vision_tokens, d)
    f = f.transpose(0, 2, 1, 3, 4)                        # [B, I, S, V, D]
    f = _safe_l2_normalize(f)
    n = bsz * max_num_ips * n_sources
    views = f.reshape(n, num_vision_tokens, d).astype(jnp.float32)
    valid = ip_exists.reshape(n) > 0

    # mean token-pair similarity == sim of token-mean pooled features scaled;
    # compute exactly: sim[a, b] = mean_{u,v} <t_au, t_bv>
    pooled = views.mean(axis=1)                            # [N, D]
    sim = pooled @ pooled.T / temperature

    ident = jnp.arange(bsz * max_num_ips).repeat(n_sources)
    same_class = ident[:, None] == ident[None, :]
    eye = jnp.eye(n, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & ~eye
    pos_mask = same_class & pair_valid
    neg_inf = jnp.asarray(-1e9, sim.dtype)
    logits = jnp.where(pair_valid, sim, neg_inf)
    log_denom = jax.nn.logsumexp(logits, axis=1)
    per_pos = -(jnp.where(pos_mask, sim, neg_inf) - log_denom[:, None])
    n_pos = jnp.sum(pos_mask, axis=1)
    anchor_loss = jnp.sum(jnp.where(pos_mask, per_pos, 0.0), axis=1) / jnp.clip(
        n_pos, 1, None)
    has_pos = n_pos > 0
    total = jnp.sum(jnp.where(has_pos, anchor_loss, 0.0))
    return total / jnp.clip(jnp.sum(has_pos), 1, None)
