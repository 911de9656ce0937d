"""Direct numeric parity vs the ACTUAL reference torch modules.

The reference's Resampler, projection models, and MaskedIPAttnProcessor2_0 are
pure torch (no diffusers/xformers dependency), so we import them straight from
``/root/reference`` and compare outputs against the JAX ports with identical
weights — true cross-framework parity, the strongest evidence SURVEY.md §4
asks for. Skipped automatically when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "src", "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from src.models import projection as ref_projection  # noqa: E402
from src.models import resampler as ref_resampler  # noqa: E402
from src.models.attention_processor import MaskedIPAttnProcessor2_0  # noqa: E402

from diffsensei_tpu.core.config import ResamplerConfig  # noqa: E402
from diffsensei_tpu.models.projection import (  # noqa: E402
    ImageProjDummyModel, ImageProjModel)
from diffsensei_tpu.models.resampler import Resampler  # noqa: E402
from diffsensei_tpu.ops.masked_ip import (  # noqa: E402
    build_ip_attention_bias, seq_len_to_hw)
from diffsensei_tpu.utils import port_torch  # noqa: E402

ATOL = 5e-4


def test_resampler_parity_vs_reference():
    """Reference ``Resampler`` (src/models/resampler.py:79-143) vs JAX port."""
    torch.manual_seed(0)
    ref = ref_resampler.Resampler(
        dim=48, depth=2, dim_head=8, heads=4, num_queries=4,
        num_dummy_tokens=3, embedding_dim=40, magi_embedding_dim=24,
        output_dim=32, ff_mult=2).eval()

    cfg = ResamplerConfig(dim=48, depth=2, dim_head=8, heads=4, num_queries=4,
                          num_dummy_tokens=3, embedding_dim=40,
                          magi_embedding_dim=24, output_dim=32, ff_mult=2)
    model = Resampler(cfg)
    params = port_torch.port_resampler(ref.state_dict(), depth=2)

    rng = np.random.default_rng(0)
    clip = rng.normal(size=(2, 3, 7, 40)).astype(np.float32)   # [B, I, P, D]
    magi = rng.normal(size=(2, 3, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(clip),
                   torch.tensor(magi).reshape(2 * 3, 24)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(clip), jnp.asarray(magi)))
    assert got.shape == want.shape == (2, 3 + 3 * 4, 32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_image_proj_model_parity_vs_reference():
    torch.manual_seed(1)
    ref = ref_projection.ImageProjModel(
        cross_attention_dim=16, clip_embeddings_dim=24,
        clip_extra_context_tokens=4).eval()
    model = ImageProjModel(cross_attention_dim=16, num_tokens=4)
    params = port_torch.port_image_proj(ref.state_dict())

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(2, 3, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(emb)).numpy()      # [B*I, tokens, dim]
    got = np.asarray(model.apply(params, jnp.asarray(emb.reshape(6, 24))))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_image_proj_dummy_model_parity_vs_reference():
    """Branch-wise LayerNorm-then-sum semantics (projection.py:55-63)."""
    torch.manual_seed(2)
    ref = ref_projection.ImageProjDummyModel(
        cross_attention_dim=16, clip_embeddings_dim=24, magi_embeddings_dim=12,
        clip_extra_context_tokens=4, num_dummy_tokens=3, use_magi=True).eval()
    model = ImageProjDummyModel(cross_attention_dim=16, num_tokens=4,
                                num_dummy_tokens=3)
    params = port_torch.port_image_proj(ref.state_dict())

    rng = np.random.default_rng(2)
    clip = rng.normal(size=(2, 3, 24)).astype(np.float32)
    magi = rng.normal(size=(2, 3, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(clip), torch.tensor(magi)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(clip), jnp.asarray(magi)))
    assert got.shape == want.shape == (2, 3 + 3 * 4, 16)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("hw,aspect", [((8, 8), 1.0), ((12, 6), 2.0),
                                       ((6, 10), 0.6)])
def test_masked_ip_bias_vs_reference_processor(hw, aspect):
    """build_ip_attention_bias vs the reference's per-(batch, ip) Python loop
    (attention_processor.py:115-169), including the dummy-token complement and
    the repeat_interleave block layout."""
    h, w = hw
    num_ip_tokens, num_dummy = 8, 2     # 4 chars * 2 vision tokens
    proc = MaskedIPAttnProcessor2_0(
        hidden_size=16, cross_attention_dim=16,
        num_ip_tokens=num_ip_tokens, num_dummy_tokens=num_dummy)
    rng = np.random.default_rng(3)
    bbox = np.zeros((2, 4, 4), np.float32)
    for b in range(2):
        for i in range(3):          # leave char 3 as the zero bbox (padding)
            x1, y1 = rng.uniform(0, 0.7, 2)
            bbox[b, i] = [x1, y1, x1 + rng.uniform(0.1, 0.3),
                          y1 + rng.uniform(0.1, 0.3)]
    hidden = torch.zeros((2, h * w, 16))
    with torch.no_grad():
        want = proc.prepare_attention_mask_ip(
            torch.tensor(bbox), hidden, head_size=3,
            aspect_ratio=aspect).numpy()

    assert seq_len_to_hw(h * w, aspect) == (h, w)
    got = np.asarray(build_ip_attention_bias(
        jnp.asarray(bbox), h, w, num_vision_tokens=num_ip_tokens // 4,
        num_dummy_tokens=num_dummy))
    # ours is [B, S, K] broadcast over heads; reference materializes heads
    np.testing.assert_array_equal(
        np.broadcast_to(got[:, None], want.shape), want)
