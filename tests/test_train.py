"""Train-step tests: losses, param selection, a full tiny stage-2 step, and the
same step sharded over the virtual 8-device mesh (the reference validated
multi-GPU by running jobs; we validate the sharded step in-CI, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffsensei_tpu.core.config import MangaConfig
from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.parallel.mesh import (
    MeshSpec, make_mesh, shard_batch, shard_params, unet_param_sharding_rules)
from diffsensei_tpu.pipelines.pipeline import PipelineModules
from diffsensei_tpu.train import losses
from diffsensei_tpu.train.diffusion import (
    FrozenDiffusionStack, Stage2Config, TrainState, make_stage1_step,
    make_stage2_step)
from diffsensei_tpu.train.optim import (
    count_params, make_lr_schedule, make_optimizer, unet_trainable_mask)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
def test_mean_multiple_ip_embeds_masks_invalid_sources():
    b, s, i, v, d = 2, 2, 2, 3, 4
    dummy = 2
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(b * s, dummy + i * v, d)), jnp.float32)
    exists = jnp.asarray([[[1, 0], [1, 1]], [[0, 0], [1, 0]]], jnp.float32)
    out = losses.mean_multiple_ip_embeds(embeds, exists, dummy, i, v, b)
    assert out.shape == (b, dummy + i * v, d)
    # char (0,0): only source 0 valid -> equals source-0 block exactly
    blocks = np.asarray(embeds).reshape(b, s, dummy + i * v, d)
    np.testing.assert_allclose(
        np.asarray(out)[0, dummy:dummy + v], blocks[0, 0, dummy:dummy + v],
        rtol=1e-6)
    # char (0,1): mean of both sources
    np.testing.assert_allclose(
        np.asarray(out)[0, dummy + v:],
        (blocks[0, 0, dummy + v:] + blocks[0, 1, dummy + v:]) / 2, rtol=1e-6)


def test_ip_contrastive_loss_prefers_consistent_views():
    b, i, s, v, d = 2, 2, 2, 4, 8
    rng = np.random.default_rng(1)
    # consistent: both views of each char identical
    chars = rng.normal(size=(b, i, 1, v, d))
    consistent = np.broadcast_to(chars, (b, i, s, v, d))
    consistent = consistent.transpose(0, 2, 1, 3, 4).reshape(b * s, i * v, d)
    exists = jnp.ones((b, i, s), jnp.float32)
    loss_good = losses.ip_contrastive_loss(
        jnp.asarray(consistent, jnp.float32), exists, b, i, v)
    # inconsistent: every view independent noise
    bad = rng.normal(size=(b * s, i * v, d)).astype(np.float32)
    loss_bad = losses.ip_contrastive_loss(jnp.asarray(bad), exists, b, i, v)
    assert float(loss_good) < float(loss_bad)


@pytest.mark.parametrize("fn", [losses.ip_contrastive_loss,
                                losses.ip_contrastive_loss_slow])
def test_ip_contrastive_loss_grad_finite_at_zero_embeds(fn):
    """Regression: an all-zero pooled character feature (padded sample, or a
    zeros-init smoke run) must NOT NaN the gradient. The old
    ``f / clip(norm(f), 1e-6)`` form had 0*NaN = NaN cotangents at f=0 and
    one such feature poisoned every resampler param after a single AdamW
    step (observed in the round-5 sustained-training run, step 2)."""
    b, i, s, v, d = 2, 2, 2, 2, 4
    exists = jnp.ones((b, i, s), jnp.float32)
    zero = jnp.zeros((b * s, i * v, d), jnp.float32)
    grad = jax.grad(lambda e: fn(e, exists, b, i, v))(zero)
    assert np.isfinite(np.asarray(grad)).all()
    # mixed case: one real character, one all-zero character block
    rng = np.random.default_rng(2)
    mixed = jnp.asarray(rng.normal(size=(b * s, i * v, d)), jnp.float32)
    mixed = mixed.at[:, :v].set(0.0)
    loss, grad = jax.value_and_grad(lambda e: fn(e, exists, b, i, v))(mixed)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


def test_ip_contrastive_loss_no_positives_is_zero():
    b, i, s, v, d = 1, 2, 2, 2, 4
    embeds = jnp.ones((b * s, i * v, d), jnp.float32)
    exists = jnp.asarray([[[1, 0], [0, 1]]], jnp.float32)  # one view per char
    loss = losses.ip_contrastive_loss(embeds, exists, b, i, v)
    assert float(loss) == 0.0


# ---------------------------------------------------------------------------
# optimizer / selection
# ---------------------------------------------------------------------------
def test_lr_schedules():
    s = make_lr_schedule("cosine_with_min_lr", 1.0, num_warmup_steps=10,
                         num_training_steps=110, min_lr_ratio=0.1)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert abs(float(s(110)) - 0.1) < 1e-6
    lin = make_lr_schedule("linear", 2.0, num_warmup_steps=0,
                           num_training_steps=100)
    assert abs(float(lin(50)) - 1.0) < 1e-6


def test_lr_schedules_registry_tail():
    # polynomial: base → lr_end over training, linear warmup first
    p = make_lr_schedule("polynomial", 1.0, num_warmup_steps=10,
                         num_training_steps=110, power=2.0, lr_end=0.01)
    assert float(p(0)) == 0.0
    assert abs(float(p(10)) - 1.0) < 1e-6          # end of warmup
    assert abs(float(p(60)) - (0.01 + 0.99 * 0.25)) < 1e-5   # progress 0.5
    assert abs(float(p(110)) - 0.01) < 1e-6        # floor at lr_end
    # inverse_sqrt: 1.0 at end of warmup, then ∝ 1/sqrt(step/timescale)
    inv = make_lr_schedule("inverse_sqrt", 1.0, num_warmup_steps=100)
    assert abs(float(inv(100)) - 1.0) < 1e-5
    assert abs(float(inv(400)) - 0.5) < 1e-5       # 4x steps → half lr
    # cosine_with_restarts: hits ~0 at each restart boundary, back to base
    r = make_lr_schedule("cosine_with_restarts", 1.0, num_warmup_steps=0,
                         num_training_steps=100, num_cycles=2)
    assert abs(float(r(0)) - 1.0) < 1e-6
    assert float(r(49)) < 0.01                     # end of first cycle
    assert abs(float(r(50)) - 1.0) < 1e-3          # restart
    assert float(r(100)) == 0.0
    import pytest
    with pytest.raises(ValueError):
        make_lr_schedule("reduce_on_plateau", 1.0)


def test_unet_trainable_mask_modes(tiny_stack):
    modules, _, _ = tiny_stack
    params = modules.unet_params
    full = unet_trainable_mask(params, "full")
    new = unet_trainable_mask(params, "new")
    ip = unet_trainable_mask(params, "ip")
    n_full, n_new, n_ip = (count_params(params, m) for m in (full, new, ip))
    assert n_full > n_new > n_ip > 0
    # 'ip' selects exactly the to_k_ip/to_v_ip kernels; 'new' adds dialog emb
    dialog_size = modules.unet.config.block_out_channels[0]
    assert n_new == n_ip + dialog_size


# ---------------------------------------------------------------------------
# full steps
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_stack():
    modules = PipelineModules.tiny(jax.random.key(0))
    frozen = FrozenDiffusionStack(
        vae=modules.vae, vae_params=modules.vae_params,
        text_encoder=modules.text_encoder,
        text_encoder_params=modules.text_encoder_params,
        text_encoder_2=modules.text_encoder_2,
        text_encoder_2_params=modules.text_encoder_2_params,
        image_encoder=modules.image_encoder,
        image_encoder_params=modules.image_encoder_params,
        magi_encoder=modules.magi_encoder,
        magi_encoder_params=modules.magi_encoder_params,
    )
    manga = modules.manga
    return modules, frozen, manga


def _stage2_batch(manga, b=2, hw=32, sources=2):
    rng = np.random.default_rng(3)
    i = manga.max_num_ips
    return {
        "pixel_values": jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)),
                                    jnp.float32),
        "text_input_ids": jnp.asarray(rng.integers(1, 250, (b, 77)), jnp.int32),
        "text_input_ids_2": jnp.asarray(rng.integers(1, 250, (b, 77)), jnp.int32),
        "ip_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, sources, 224, 224, 3)), jnp.float32),
        "magi_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (b, i, sources, 224, 224, 3)), jnp.float32),
        "ip_exists": jnp.asarray(rng.integers(0, 2, (b, i, sources)),
                                 jnp.float32),
        "ip_bbox": jnp.asarray(rng.uniform(0, 1, (b, i, 4)), jnp.float32),
        "dialog_bbox": jnp.asarray(
            rng.uniform(0, 1, (b, manga.max_num_dialogs, 4)), jnp.float32),
        "original_size": jnp.full((b, 2), float(hw)),
        "crop_coords_top_left": jnp.zeros((b, 2)),
        "target_size": jnp.full((b, 2), float(hw)),
    }


def test_stage1_step_decreases_nothing_but_runs(tiny_stack):
    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    step_fn = make_stage1_step(modules.unet, schedule)
    tx = make_optimizer(1e-4)
    state = TrainState.create(modules.unet_params, tx)
    batch = {k: v for k, v in _stage2_batch(manga).items()
             if k in ("pixel_values", "text_input_ids", "text_input_ids_2",
                      "original_size", "crop_coords_top_left", "target_size")}
    state2, metrics = jax.jit(step_fn)(state, frozen, batch, jax.random.key(0))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_stage2_step_trains_selected_params_only(tiny_stack):
    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    cfg = Stage2Config(manga=manga, ip_contrastive="fast",
                       ip_contrastive_weight=0.1)
    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               schedule, cfg)
    params = {"unet": modules.unet_params,
              "resampler": modules.resampler_params}
    mask = {"unet": unet_trainable_mask(modules.unet_params, "new"),
            "resampler": jax.tree.map(lambda _: True, modules.resampler_params)}
    tx = make_optimizer(1e-3, trainable_mask=mask)
    state = TrainState.create(params, tx)
    batch = _stage2_batch(manga)
    state2, metrics = jax.jit(step_fn)(state, frozen, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_ip_contrastive"]))

    # frozen UNet params (non-ip, non-dialog) must be bit-identical
    def check(path_ok, old, new):
        moved = bool(jnp.any(old != new))
        return moved == path_ok or not moved
    flat_old = jax.tree_util.tree_leaves_with_path(state.params["unet"])
    flat_new = jax.tree.leaves(state2.params["unet"])
    flat_mask = jax.tree.leaves(mask["unet"])
    moved_frozen = [
        bool(jnp.any(o[1] != n)) for (o, n, m) in
        zip(flat_old, flat_new, flat_mask) if not m
    ]
    assert not any(moved_frozen), "a frozen UNet param moved"
    moved_trainable = [
        bool(jnp.any(o[1] != n)) for (o, n, m) in
        zip(flat_old, flat_new, flat_mask) if m
    ]
    assert any(moved_trainable), "no trainable UNet param moved"


def test_stage2_step_sharded_on_mesh(tiny_stack, eight_devices):
    """The DDP-equivalent: batch on the data axis, replicated params."""
    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    cfg = Stage2Config(manga=manga)
    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               schedule, cfg)
    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    params = {"unet": modules.unet_params,
              "resampler": modules.resampler_params}
    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)
    state = state.replace(
        params=shard_params(state.params, mesh, unet_param_sharding_rules()),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            if hasattr(x, "shape") else x, state.opt_state))
    batch = shard_batch(_stage2_batch(manga, b=8, hw=16, sources=1), mesh)
    with mesh:
        state2, metrics = jax.jit(step_fn)(state, frozen, batch,
                                           jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_gradient_accumulation_matches_mean_gradient_step(tiny_stack):
    """The CLI's optax.MultiSteps wiring (cli.py accum>1) reproduces the
    reference ``accelerator.accumulate`` semantics (train.py:336): K micro
    steps on batch B apply exactly one optimizer update with the mean of the
    K micro gradients — which IS the gradient of the K·B batch, since the
    diffusion loss is a per-sample mean (VERDICT r2 weak #4)."""
    import optax

    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               schedule, Stage2Config(manga=manga))
    params = {"unet": modules.unet_params,
              "resampler": modules.resampler_params}

    rngs = [jax.random.key(11), jax.random.key(12)]
    batches = [_stage2_batch(manga, b=2), _stage2_batch(manga, b=2)]
    batches[1] = {k: v[::-1] if hasattr(v, "shape") else v
                  for k, v in batches[1].items()}     # distinct micro-batches

    # accumulated path: MultiSteps(K=2) through the real train step. SGD for
    # the inner tx: Adam's update is (a) scale-invariant — it cannot tell
    # mean from sum accumulation — and (b) ill-conditioned at near-zero
    # gradient coordinates (m/sqrt(v) swings by O(lr) under 1-ulp input
    # changes), so SGD is the optimizer that actually tests the semantics.
    tx = optax.sgd(1e-3)
    state = TrainState.create(params, optax.MultiSteps(tx, every_k_schedule=2))
    mid, _ = jax.jit(step_fn)(state, frozen, batches[0], rngs[0])
    # micro step 1 must NOT touch params
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                        state.params, mid.params)
    assert all(jax.tree.leaves(same)), "MultiSteps applied an early update"
    final, _ = jax.jit(step_fn)(mid, frozen, batches[1], rngs[1])

    # reference path: one update with the mean of the two micro gradients
    grad_fn = jax.grad(lambda p, b, r: step_fn.loss_fn(p, frozen, b, r)[0])
    g1 = grad_fn(params, batches[0], rngs[0])
    g2 = grad_fn(params, batches[1], rngs[1])
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    updates, _ = tx.update(g_mean, tx.init(params), params)
    expected = optax.apply_updates(params, updates)

    flat_a = jax.tree.leaves(final.params)
    flat_b = jax.tree.leaves(expected)
    # MultiSteps keeps a RUNNING mean (acc + (g-acc)/k) vs the closed-form
    # (g1+g2)/2 — equal up to last-ulp fp32 rounding, scaled by lr
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_stage2_step_captures_no_large_constants(tiny_stack):
    """Regression guard for the closure-capture OOM class: every frozen tree
    must enter the jitted step through the argument list. A step that closes
    over params shows them as multi-MB jaxpr constants (at SDXL scale that
    was a measured 8.3 GB of duplicated program constants → OOM)."""
    modules, frozen, manga = tiny_stack
    step_fn = make_stage2_step(modules.unet, modules.resampler, DDPMSchedule(),
                               Stage2Config(manga=manga))
    state = TrainState.create({"unet": modules.unet_params,
                               "resampler": modules.resampler_params},
                              make_optimizer(1e-4))
    jaxpr = jax.make_jaxpr(step_fn)(state, frozen, _stage2_batch(manga),
                                    jax.random.key(0))
    const_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize
                      for c in jaxpr.consts if hasattr(c, "shape"))
    frozen_bytes = sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves(frozen) if hasattr(x, "size"))
    # scheduler tables etc. are allowed; frozen trees (tiny stack: >10 MB) not
    assert const_bytes < 1 << 20, (
        f"step captured {const_bytes/1e6:.1f} MB of constants "
        f"(frozen stack is {frozen_bytes/1e6:.1f} MB — closed over?)")
