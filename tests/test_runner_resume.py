"""run_training resume: exact continuation from the latest checkpoint."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffsensei_tpu.train.diffusion import TrainState
from diffsensei_tpu.train.optim import make_optimizer
from diffsensei_tpu.train.runner import RunConfig, run_training


def _step_fn(state, frozen, batch, rng):
    def loss_fn(p):
        return jnp.mean(jnp.square(p["w"] @ batch["x"] - batch["y"]))
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), {"loss": loss}


def _batches():
    rng = np.random.default_rng(0)
    while True:
        yield {"x": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32),
               "y": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)}


def test_resume_continues_exactly(tmp_path):
    log_dir = os.fspath(tmp_path / "run")
    params = {"w": jnp.ones((3, 4), jnp.float32)}
    tx = make_optimizer(1e-2)

    # uninterrupted 4-step run
    state_full = run_training(
        _step_fn, TrainState.create(params, tx),
        itertools.islice(_batches(), 8),
        RunConfig(max_train_steps=4, log_dir=os.fspath(tmp_path / "full"),
                  log_every=1, checkpoint_every=10),
        donate_state=False)

    # 2 steps, checkpoint, then resume for 2 more — batches replay identically
    run_training(
        _step_fn, TrainState.create(params, tx),
        itertools.islice(_batches(), 8),
        RunConfig(max_train_steps=2, log_dir=log_dir, log_every=1,
                  checkpoint_every=2),
        donate_state=False)
    # resume: feed the stream with the first 2 batches already consumed
    stream = _batches()
    for _ in range(2):
        next(stream)
    state_resumed = run_training(
        _step_fn, TrainState.create(params, tx),
        itertools.islice(stream, 8),
        RunConfig(max_train_steps=4, log_dir=log_dir, log_every=1,
                  checkpoint_every=2, resume=True),
        donate_state=False)

    assert int(state_resumed.step) == 4
    np.testing.assert_allclose(np.asarray(state_resumed.params["w"]),
                               np.asarray(state_full.params["w"]),
                               rtol=1e-6, atol=1e-6)
    # both checkpoints exist (step-2 rotated away only if limit exceeded)
    assert os.path.isdir(os.path.join(log_dir, "step-4"))


def test_checkpoint_steps_list(tmp_path):
    """Explicit checkpointing_steps snapshot at listed milestones on top of
    the interval (reference self_0.5.yaml:59-60 semantics)."""
    import os

    import jax
    import jax.numpy as jnp

    from diffsensei_tpu.train.diffusion import TrainState
    from diffsensei_tpu.train.optim import make_optimizer
    from diffsensei_tpu.train.runner import RunConfig, run_training

    def step_fn(state, frozen, batch, rng):
        return state.apply_gradients(
            jax.tree.map(jnp.ones_like, state.params)), {"loss": jnp.float32(0)}

    state = TrainState.create({"w": jnp.zeros((2,))}, make_optimizer(1e-2))
    log_dir = os.fspath(tmp_path / "run")
    cfg = RunConfig(max_train_steps=7, log_dir=log_dir, log_every=100,
                    checkpoint_every=1000, checkpoint_steps=(2, 5),
                    checkpoints_total_limit=10)
    batches = [{"x": jnp.zeros(())}] * 10
    run_training(step_fn, state, batches, cfg, donate_state=False)
    dirs = sorted(d for d in os.listdir(log_dir) if d.startswith("step-"))
    assert dirs == ["step-2", "step-5", "step-7"]   # listed + final


def test_resume_preserves_fsdp_sharding(tmp_path, eight_devices):
    """Resume must restore each leaf to the incoming state's sharding — a
    bare jnp.asarray would replicate FSDP-sharded params/moments on every
    device (the memory blowup the sharding existed to avoid)."""
    from diffsensei_tpu.parallel.mesh import (
        MeshSpec, make_mesh, shard_params_fsdp)

    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    log_dir = os.fspath(tmp_path / "fsdp")
    params = {"w": jnp.ones((3, 8), jnp.float32)}

    def _batches():          # shadows module gen: x matches w's (3, 8)
        rng = np.random.default_rng(0)
        while True:
            yield {"x": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
                   "y": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)}

    def make_state():
        p = shard_params_fsdp(params, mesh, min_size=0)
        s = TrainState.create(p, make_optimizer(1e-2))
        return s.replace(opt_state=shard_params_fsdp(s.opt_state, mesh,
                                                     min_size=0))

    with mesh:
        run_training(
            _step_fn, make_state(), itertools.islice(_batches(), 4),
            RunConfig(max_train_steps=2, log_dir=log_dir, log_every=1,
                      checkpoint_every=2), donate_state=False)
        resumed = run_training(
            _step_fn, make_state(), itertools.islice(_batches(), 0),
            RunConfig(max_train_steps=2, log_dir=log_dir, log_every=1,
                      checkpoint_every=2, resume=True), donate_state=False)

    assert int(resumed.step) == 2
    w = resumed.params["w"]
    assert not w.sharding.is_fully_replicated, "resume replicated the params"
    assert w.addressable_shards[0].data.shape == (3, 1)
    sharded_moments = sum(
        1 for leaf in jax.tree.leaves(resumed.opt_state)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated)
    assert sharded_moments > 0, "resume replicated the optimizer moments"
