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
