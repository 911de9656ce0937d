"""LLaMA port parity vs HF transformers (real cross-framework check)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffsensei_tpu.core.config import LlamaConfig  # noqa: E402
from diffsensei_tpu.models.mllm.llama import LlamaForCausalLM  # noqa: E402
from diffsensei_tpu.utils import port_torch  # noqa: E402


def _hf_tiny(num_kv_heads=4):
    return transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)


@pytest.mark.parametrize("num_kv_heads", [4, 2])
def test_llama_port_parity(num_kv_heads):
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(_hf_tiny(num_kv_heads)).eval()

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=num_kv_heads,
                      max_position_embeddings=128)
    model = LlamaForCausalLM(cfg)
    params = port_torch.port_llama(hf.state_dict(), num_layers=2)

    ids = np.random.default_rng(0).integers(0, 128, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_llama_port_with_lora():
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(_hf_tiny()).eval()
    sd = {k: v for k, v in hf.state_dict().items()}
    # synthesize a peft-style LoRA adapter on q_proj of layer 0
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 64)).astype(np.float32) * 0.02   # [r, in]
    bq = rng.normal(size=(64, 4)).astype(np.float32) * 0.02  # [out, r]
    sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.default.weight"] = \
        torch.tensor(a)
    sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.default.weight"] = \
        torch.tensor(bq)

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=128)
    model = LlamaForCausalLM(cfg, lora_rank=4)
    params = port_torch.port_llama(sd, num_layers=2)

    # un-adapted projections need zero lora params: overlay the ported
    # leaves onto a zero-LoRA init
    import flax
    base = flax.core.unfreeze(
        model.init(jax.random.key(0), input_ids=jnp.zeros((1, 4), jnp.int32)))

    def zero_lora(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                zero_lora(v)
            elif k in ("lora_a", "lora_b"):
                tree[k] = jnp.zeros_like(v)

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                dst[k] = v

    zero_lora(base["params"])
    import copy
    base_zero = copy.deepcopy(base)
    overlay(base["params"], params["params"])
    overlay(base_zero["params"], params["params"])
    zero_lora(base_zero["params"])

    ids = np.random.default_rng(2).integers(0, 128, (1, 8))
    got, _, _ = model.apply(base, jnp.asarray(ids, jnp.int32))
    got_base, _, _ = model.apply(base_zero, jnp.asarray(ids, jnp.int32))
    # the ported adapter is nonzero, so outputs must differ
    assert float(jnp.abs(got - got_base).max()) > 0

    q = base["params"]["layers_0"]["attn"]["q_proj"]
    np.testing.assert_allclose(np.asarray(q["lora_a"]), a.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q["lora_b"]), bq.T, rtol=1e-6)


def test_qwen_resampler_port():
    from diffsensei_tpu.core.config import QwenResamplerConfig
    from diffsensei_tpu.models.mllm.qwen_resampler import QwenResampler

    e, kv = 32, 16
    torch.manual_seed(3)
    sd = {
        "query": torch.randn(4, e),
        "kv_proj.weight": torch.randn(e, kv),
        "ln_q.weight": torch.randn(e), "ln_q.bias": torch.randn(e),
        "ln_kv.weight": torch.randn(e), "ln_kv.bias": torch.randn(e),
        "attn.in_proj_weight": torch.randn(3 * e, e),
        "attn.in_proj_bias": torch.randn(3 * e),
        "attn.out_proj.weight": torch.randn(e, e),
        "attn.out_proj.bias": torch.randn(e),
    }
    params = port_torch.port_qwen_resampler(sd)
    cfg = QwenResamplerConfig(grid_size=2, embed_dim=e, num_heads=4, kv_dim=kv)
    model = QwenResampler(cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, kv)),
                    jnp.float32)
    out = model.apply(params, x)
    assert out.shape == (1, 4, e)
    assert bool(jnp.isfinite(out).all())