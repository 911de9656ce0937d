"""Partitioned training (grads only for trainable subtree) vs masked training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.train.diffusion import (
    Stage2Config, TrainState, make_stage2_step)
from diffsensei_tpu.train.optim import (
    make_optimizer, merge_partitioned, partition_params, unet_trainable_mask)

from tests.test_train import _stage2_batch, tiny_stack  # noqa: F401


def test_partition_roundtrip(tiny_stack):  # noqa: F811
    modules, _, _ = tiny_stack
    mask = unet_trainable_mask(modules.unet_params, "new")
    t, f = partition_params(modules.unet_params, mask)
    assert t and f
    merged = merge_partitioned(t, f)
    flat_a = jax.tree_util.tree_leaves(merged)
    flat_b = jax.tree_util.tree_leaves(modules.unet_params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partitioned_step_matches_masked_step(tiny_stack):  # noqa: F811
    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    cfg = Stage2Config(manga=manga)
    batch = _stage2_batch(manga)
    rng = jax.random.key(3)

    # masked variant (full tree + multi_transform freeze)
    mask = {"unet": unet_trainable_mask(modules.unet_params, "new"),
            "resampler": jax.tree.map(lambda _: True,
                                      modules.resampler_params)}
    step_m = make_stage2_step(modules.unet, modules.resampler,
                              schedule, cfg)
    state_m = TrainState.create(
        {"unet": modules.unet_params, "resampler": modules.resampler_params},
        make_optimizer(1e-3, trainable_mask=mask))
    state_m2, metrics_m = jax.jit(step_m)(state_m, frozen, batch, rng)

    # partitioned variant (trainable subtree only)
    t_flat, f_flat = partition_params(modules.unet_params, mask["unet"])
    step_p = make_stage2_step(modules.unet, modules.resampler,
                              schedule, cfg)
    frozen_p = frozen.replace(unet_frozen_flat=f_flat)
    state_p = TrainState.create(
        {"unet": t_flat, "resampler": modules.resampler_params},
        make_optimizer(1e-3))
    state_p2, metrics_p = jax.jit(step_p)(state_p, frozen_p, batch, rng)

    np.testing.assert_allclose(float(metrics_m["loss"]),
                               float(metrics_p["loss"]), rtol=1e-5)

    # updated trainable leaves must match between the two formulations
    from flax import traverse_util
    updated_m = traverse_util.flatten_dict(state_m2.params["unet"], sep="/")
    for key, v_p in state_p2.params["unet"].items():
        np.testing.assert_allclose(
            np.asarray(updated_m[key]), np.asarray(v_p),
            rtol=2e-4, atol=2e-5, err_msg=key)
