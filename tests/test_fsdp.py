"""FSDP / ZeRO-3 sharding over the data axis (``trainer.parallel: fsdp``).

The reference's only distribution strategy is DDP (replicated params,
``scripts/train/train.py:85-88`` via Accelerate/NCCL) — which cannot hold
SDXL full-fine-tune AdamW state (params + grads + 2 moments) on a 16 GB v5e.
The TPU-native answer is declarative FSDP: shard every large param leaf over
the ``data`` axis (``parallel/mesh.py::fsdp_spec``) and let XLA's SPMD
partitioner insert the all-gathers / reduce-scatters. These tests prove the
sharded step is numerically the SAME training step as replicated DP.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from diffsensei_tpu.models.schedulers import DDPMSchedule
from diffsensei_tpu.parallel.mesh import (
    MeshSpec, fsdp_param_specs, fsdp_spec, make_mesh, shard_batch,
    shard_params_fsdp)
from diffsensei_tpu.train.diffusion import (
    Stage2Config, TrainState, make_stage2_step)

from tests.test_train import _stage2_batch, tiny_stack  # noqa: F401


def test_fsdp_spec_picks_largest_divisible_dim():
    # largest dim divisible by 8 is sharded
    assert fsdp_spec((3, 3, 64, 128), 8, min_size=0) == P(None, None, None,
                                                          "data")
    assert fsdp_spec((320, 2560), 8, min_size=0) == P(None, "data")
    # ties/odd dims: falls through to the next-largest divisible dim
    assert fsdp_spec((7, 640), 8, min_size=0) == P(None, "data")
    # nothing divisible -> replicate
    assert fsdp_spec((7, 9), 8, min_size=0) == P()
    # small leaves replicate under the default threshold
    assert fsdp_spec((128,), 8) == P()
    assert fsdp_spec((), 8, min_size=0) == P()


def test_fsdp_specs_cover_param_tree(tiny_stack):  # noqa: F811
    modules, _, _ = tiny_stack
    mesh = make_mesh(MeshSpec(data=8, model=1), jax.devices()[:8])
    specs = fsdp_param_specs(modules.unet_params, mesh, min_size=0)
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any(s != P() for s in flat), "no UNet leaf sharded"


def test_fsdp_step_matches_replicated_dp(tiny_stack, eight_devices):  # noqa: F811
    """One stage-2 step, FSDP-sharded vs replicated: same loss, same update,
    and the FSDP state (params AND optimizer moments) actually lives sharded."""
    modules, frozen, manga = tiny_stack
    schedule = DDPMSchedule()
    cfg = Stage2Config(manga=manga)
    step_fn = make_stage2_step(modules.unet, modules.resampler,
                               schedule, cfg)
    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    params = {"unet": modules.unet_params,
              "resampler": modules.resampler_params}
    batch = _stage2_batch(manga, b=8, hw=16, sources=1)
    rng = jax.random.key(7)

    # SGD+momentum for the equivalence check: the first AdamW step is
    # ~lr*sign(g), so reduce-scatter reordering noise on near-zero grads
    # flips signs and produces ±2lr param diffs that say nothing about
    # sharding correctness. SGD keeps the update linear in the gradient
    # while still carrying a params-shaped optimizer-state leaf (the
    # momentum trace) for the sharding assertions. The CLI's AdamW path
    # is exercised by the dryrun_multichip FSDP leg.
    import optax
    make_tx = lambda: optax.sgd(1e-3, momentum=0.9)  # noqa: E731

    # replicated DP reference
    state_r = TrainState.create(params, make_tx())
    with mesh:
        state_r2, metrics_r = jax.jit(step_fn)(
            state_r, frozen, shard_batch(batch, mesh), rng)

    # FSDP: params, frozen stack, and moments sharded over the data axis
    params_f = shard_params_fsdp(params, mesh, min_size=0)
    frozen_f = shard_params_fsdp(frozen, mesh, min_size=0)
    state_f = TrainState.create(params_f, make_tx())
    state_f = state_f.replace(
        opt_state=shard_params_fsdp(state_f.opt_state, mesh, min_size=0))
    with mesh:
        state_f2, metrics_f = jax.jit(step_fn)(
            state_f, frozen_f, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(metrics_r["loss"]),
                               float(metrics_f["loss"]), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(state_r2.params)
    flat_f = jax.tree.leaves(state_f2.params)
    assert len(flat_r) == len(flat_f)
    for (path, v_r), v_f in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(v_r), np.asarray(v_f), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))

    # the updated state stayed sharded (params and AdamW moments)
    def num_sharded(tree):
        return sum(
            1 for leaf in jax.tree.leaves(tree)
            if hasattr(leaf, "sharding")
            and not leaf.sharding.is_fully_replicated)

    assert num_sharded(state_f2.params) > 0, "updated params not sharded"
    assert num_sharded(state_f2.opt_state) > 0, "moments not sharded"
    # and the FSDP resident bytes per device are smaller than replicated
    big = max(jax.tree.leaves(state_f2.params), key=lambda x: x.size)
    per_device = big.addressable_shards[0].data.nbytes
    assert per_device <= big.size * big.dtype.itemsize // 8, \
        "largest param leaf is fully materialized on every device"
