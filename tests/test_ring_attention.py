"""Ring attention vs single-device oracle on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsensei_tpu.ops.attention import attention_ref
from diffsensei_tpu.ops.ring_attention import ring_attention_sharded
from diffsensei_tpu.parallel.mesh import MeshSpec, make_mesh


@pytest.mark.parametrize("seq,heads", [(256, 2), (512, 4)])
def test_ring_matches_oracle(eight_devices, seq, heads):
    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, heads, seq, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, heads, seq, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, heads, seq, 32)).astype(np.float32))
    with mesh:
        got = ring_attention_sharded(q, k, v, mesh)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_ring_shards_sequence(eight_devices):
    """Output really is sequence-sharded (not gathered to one device)."""
    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    q = jnp.ones((1, 2, 128, 16), jnp.float32)
    with mesh:
        out = ring_attention_sharded(q, q, q, mesh)
    shards = out.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 2, 16, 16)


def test_dispatcher_cp_matches_plain(eight_devices):
    """multi_head_attention(cp_mesh=...) == the single-device path."""
    from diffsensei_tpu.ops.attention import multi_head_attention

    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 4, 256, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 256, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 256, 32)).astype(np.float32))
    want = multi_head_attention(q, k, v)
    with mesh:
        got = multi_head_attention(q, k, v, cp_mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_cp_unet_forward_matches_single_device(eight_devices):
    """The product wiring (UNetMangaModel.cp_mesh): a full conditioned UNet
    forward with context-parallel self-attention equals the replicated one."""
    from diffsensei_tpu.models.unet import attention_levels
    from diffsensei_tpu.ops.masked_ip import build_ip_attention_bias
    from diffsensei_tpu.pipelines.pipeline import PipelineModules

    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    modules = PipelineModules.tiny(jax.random.key(0))
    unet, params = modules.unet, modules.unet_params
    manga, ucfg = modules.manga, modules.unet.config
    rng = np.random.default_rng(2)
    lh = lw = 8
    sample = jnp.asarray(rng.normal(size=(2, lh, lw, ucfg.in_channels)),
                         jnp.float32)
    t = jnp.full((2,), 500.0)
    ctx = jnp.asarray(rng.normal(size=(2, 77, ucfg.cross_attention_dim)),
                      jnp.float32)
    pooled = jnp.zeros((2, ucfg.pooled_projection_dim))
    time_ids = jnp.full((2, 6), 64.0)
    ip = jnp.asarray(rng.normal(size=(2, manga.num_context_image_tokens,
                                      ucfg.cross_attention_dim)), jnp.float32)
    bbox = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.5, 1.0],
                                  [0.5, 0.0, 1.0, 1.0]]], jnp.float32),
                    (2, 1, 1))
    biases = {
        lv: build_ip_attention_bias(bbox, lh >> lv, lw >> lv,
                                    manga.num_vision_tokens,
                                    manga.num_dummy_tokens)
        for lv in attention_levels(ucfg)
    }
    kwargs = dict(ip_hidden_states=ip, ip_attn_bias=biases, ip_scale=0.6)
    want = unet.apply(params, sample, t, ctx, pooled, time_ids, **kwargs)
    cp_unet = unet.clone(cp_mesh=mesh, cp_min_seq=8)
    with mesh:
        got = cp_unet.apply(params, sample, t, ctx, pooled, time_ids, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_context_parallel_pipeline_matches_single_device(eight_devices):
    """PipelineConfig.context_parallel end to end: same seed, same panel."""
    from diffsensei_tpu.core.config import PipelineConfig
    from diffsensei_tpu.pipelines.pipeline import (DiffSenseiPipeline,
                                                   PipelineModules)

    mesh = make_mesh(MeshSpec(data=8, model=1), eight_devices)
    modules = PipelineModules.tiny(jax.random.key(0))
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(rng.integers(1, 255, (1, 77)), jnp.int32)
    prompt_ids = dict(ids=mk(), neg_ids=mk(), ids_2=mk(), neg_ids_2=mk())
    kwargs = dict(height=64, width=64, num_inference_steps=2,
                  num_samples=1, rng=jax.random.key(7),
                  prompt_ids=prompt_ids, snap_to_buckets=False)
    base = DiffSenseiPipeline(modules)
    want = base(**kwargs)
    cp = DiffSenseiPipeline(
        modules, PipelineConfig(context_parallel=True,
                                context_parallel_min_seq=8), mesh=mesh)
    assert cp.m.unet.cp_mesh is mesh
    with mesh:
        got = cp(**kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
