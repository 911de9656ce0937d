"""Benchmark the MLLM agent's compiled greedy decode (SURVEY §3.1 hot loop 1).

The reference's ``agent_model.generate`` (``src/models/mllm/seed_x.py:90-171``)
drives HF ``llm.generate`` token-by-token in Python with the
AutoImageTokenGenerationProcessor; here the whole decode — KV-cached LLaMA
steps, the forced <img_k> ladder, hidden-state collection — is ONE compiled
``lax.scan`` (``models/mllm/seed_x.py::_greedy_decode``).

SEED-X's released LLM is 13B-class (LlamaConfig defaults: hidden 5120, 40
layers) — bf16 params (~26 GB) exceed one v5e's HBM; serving that size uses
the TP mesh (``parallel/mesh.py::llm_param_sharding_rules``, exercised by
``__graft_entry__.dryrun_multichip``). This bench therefore measures the
single-chip decode machinery at a ~1.4B-class geometry (env-overridable) and
reports decode tokens/s with the ladder forcing live.

Usage: python tools/bench_agent_decode.py
Env: AGENT_BENCH_HIDDEN (2048), AGENT_BENCH_LAYERS (24),
     AGENT_BENCH_NEW_TOKENS (128), AGENT_BENCH_PROMPT (64),
     AGENT_BENCH_QUANT (0; 1 = int8 weight-only serving LLM — halves weight
     bytes of the HBM-bound decode; the single-chip path for 13B-class).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import (
        AgentConfig, LlamaConfig, LoRAConfig, QwenResamplerConfig)
    from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM

    hidden = int(os.environ.get("AGENT_BENCH_HIDDEN", "2048"))
    layers = int(os.environ.get("AGENT_BENCH_LAYERS", "24"))
    new_tokens = int(os.environ.get("AGENT_BENCH_NEW_TOKENS", "128"))
    prompt_len = int(os.environ.get("AGENT_BENCH_PROMPT", "64"))
    quant = os.environ.get("AGENT_BENCH_QUANT", "0") == "1"

    llm = LlamaConfig(vocab_size=32330, hidden_size=hidden,
                      intermediate_size=hidden * 11 // 4 // 128 * 128,
                      num_layers=layers, num_heads=hidden // 128,
                      num_kv_heads=hidden // 128,
                      max_position_embeddings=1024)
    cfg = AgentConfig(
        llm=llm, lora=LoRAConfig(rank=0),
        input_resampler=QwenResamplerConfig(
            grid_size=8, embed_dim=hidden, num_heads=hidden // 128,
            kv_dim=2048),
        output_resampler=QwenResamplerConfig(
            grid_size=8, embed_dim=2048, num_heads=16, kv_dim=hidden),
    )
    n_params = (llm.vocab_size * hidden * 2
                + layers * (4 * hidden * hidden + 3 * hidden
                            * llm.intermediate_size))
    matrix_params = n_params - llm.vocab_size * hidden  # all but embed
    weight_gb = (matrix_params * (1 if quant else 2)
                 + llm.vocab_size * hidden * 2) / 2**30
    print(f"# LLaMA geometry: hidden={hidden} layers={layers} "
          f"~{n_params/1e9:.2f}B params, "
          f"{'int8 weight-only' if quant else 'bf16'} (~{weight_gb:.1f} GB)",
          flush=True)

    t0 = time.perf_counter()
    agent = ContinuousLVLM.build(cfg, jax.random.key(0), dtype=jnp.bfloat16,
                                 quantized=quant)
    print(f"# build+init: {time.perf_counter()-t0:.1f}s", flush=True)

    nq = cfg.input_resampler.num_queries
    vocab = llm.vocab_size
    ladder = np.arange(vocab - nq - 2, vocab, dtype=np.int64)
    rng = np.random.default_rng(0)
    prompt = rng.integers(10, 1000, (1, prompt_len)).astype(np.int32)
    prompt[0, -1] = int(ladder[0])          # ends with <img> -> forces ladder
    image_embeds = jnp.asarray(
        rng.normal(size=(1, 257, cfg.input_resampler.kv_dim)), jnp.bfloat16)
    ids_cmp_mask = np.zeros((1, prompt_len), bool)
    ids_cmp_mask[0, 1:1 + nq] = True

    def run():
        return agent.generate(prompt, image_embeds=image_embeds,
                              ids_cmp_mask=jnp.asarray(ids_cmp_mask),
                              ladder_ids=ladder, max_new_tokens=new_tokens)

    t0 = time.perf_counter()
    out = run()
    compile_s = time.perf_counter() - t0
    assert out["num_gen_imgs"] >= 1, "ladder did not fire"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        times.append(time.perf_counter() - t0)
    times.sort()
    decode_s = times[len(times) // 2]
    print(f"# compile+first: {compile_s:.1f}s")
    print({"metric": "agent_decode_tokens_per_sec",
           "value": round(new_tokens / decode_s, 1),
           "prompt_len": prompt_len, "new_tokens": new_tokens,
           "ms_per_token": round(decode_s / new_tokens * 1000, 2),
           "num_gen_imgs": int(out["num_gen_imgs"]),
           "weights": "int8" if quant else "bf16",
           "backend": jax.default_backend()}, flush=True)


if __name__ == "__main__":
    main()
