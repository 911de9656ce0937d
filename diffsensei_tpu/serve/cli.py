"""Headless generation CLI: panels from the command line, no UI.

The reference's only serving entry points are the two Gradio scripts; this
adds the headless path the same weights serve through:

  python -m diffsensei_tpu.serve.cli --preset tiny \\
      --prompt "a young man" --height 512 --width 384 \\
      --char-image hero.png --ip-bbox 0,0,0.5,1 --out panel.png
"""

from __future__ import annotations

import argparse
import os


def mllm_spec_from_tokenizer(path: str, num_img_tokens: int = 64):
    """MLLMTokenSpec from the released agent tokenizer dir (LlamaTokenizer
    with ``<img>``/``</img>``/``<img_{k:05d}>`` added; reference
    ``seed_x.py:10-12``, ``gradio.py:40-47``). Mirrors the reference's
    ``encode(tok)[1]`` id extraction (sentencepiece prefixes a word-start
    piece at index 0)."""
    from transformers import LlamaTokenizer

    from diffsensei_tpu.data.mllm_dataset import MLLMTokenSpec

    tok = LlamaTokenizer.from_pretrained(path)

    def tid(text):
        ids = tok.encode(text, add_special_tokens=False)
        return ids[1] if len(ids) > 1 else ids[0]

    return MLLMTokenSpec(
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id,
        pad_id=tok.pad_token_id or 0,
        boi_id=tid("<img>"), eoi_id=tid("</img>"),
        img_ids=[tid(f"<img_{k:05d}>") for k in range(num_img_tokens)],
        encode_text=lambda s: tok.encode(s, add_special_tokens=False),
    )


def _parse_bbox(values):
    boxes = []
    for v in values or []:
        parts = [float(p) for p in v.replace(",", " ").split()]
        if len(parts) == 4:
            boxes.append(parts)
    return boxes


def main(argv=None):
    parser = argparse.ArgumentParser(description="DiffSensei-TPU generation")
    parser.add_argument("--preset", default="tiny", choices=["tiny", "sdxl"])
    parser.add_argument("--weights", default=None,
                        help="weights source: a YAML file mapping component "
                        "names to torch checkpoint paths (see "
                        "utils.load.apply_ported_weights), a released "
                        "DiffSensei artifact directory (contains "
                        "image_generator/), or an Orbax weights dir "
                        "(train.checkpoint.export_weights)")
    parser.add_argument("--tokenizer", default=None,
                        help="HF CLIPTokenizer dir (sdxl preset); hashed ids "
                        "fallback otherwise")
    parser.add_argument("--tokenizer-2", default=None)
    parser.add_argument("--agent-weights", default=None,
                        help="ContinuousLVLM checkpoint (mllm/agent/"
                        "pytorch_model.bin layout) — enables the MLLM "
                        "character-adaptation path")
    parser.add_argument("--mllm-tokenizer", default=None,
                        help="HF LlamaTokenizer dir with the <img_k> ladder "
                        "tokens (reference mllm/tokenizer)")
    parser.add_argument("--quantize-llm-bits", type=int, default=8,
                        choices=[4, 8],
                        help="weight-only LLM quantization width: 8 = "
                             "per-channel int8 (~13 GiB at 13B), 4 = "
                             "group-wise int4 (~6.1 GiB — co-resides with "
                             "the diffusion stack on one 16 GB chip)")
    parser.add_argument("--quantize-llm", action="store_true",
                        help="serve the agent LLM with int8 weight-only "
                        "quantization (merges LoRA, ~halves LLM HBM bytes; "
                        "fits the 13B-class SEED-X on one 16 GB v5e)")
    parser.add_argument("--quantize-unet", action="store_true",
                        help="serve the UNet's transformer matmuls as "
                             "weight-only int8 (~5.4 -> ~3.0 GiB resident at "
                             "SDXL scale) — the single-chip co-residence "
                             "mode next to --quantize-llm")
    parser.add_argument("--prompt", default="")
    parser.add_argument("--negative-prompt", default=None)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--guidance", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-samples", type=int, default=1)
    parser.add_argument("--char-image", action="append", default=[])
    parser.add_argument("--ip-bbox", action="append", default=[],
                        help="x1,y1,x2,y2 relative, one per character")
    parser.add_argument("--dialog-bbox", action="append", default=[])
    parser.add_argument("--ip-scale", type=float, default=None)
    parser.add_argument("--deep-cache", type=int, default=None,
                        help="DeepCache interval N: recompute the UNet's "
                        "deep subtree every N-th denoise step (1 = exact; "
                        "2-3 = faster, approximate)")
    parser.add_argument("--deep-cache-split", type=int, default=2,
                        help="UNet level boundary for --deep-cache")
    parser.add_argument("--scheduler", default=None,
                        choices=["euler_discrete", "ddim", "dpmsolver++"],
                        help="sampler (default: config euler_discrete; "
                             "dpmsolver++ = 2nd-order multistep)")
    parser.add_argument("--context-parallel", action="store_true",
                        help="shard big (>=16k-token) spatial self-attention "
                             "over all visible devices via ring-flash "
                             "attention — the multi-chip 2048^2-class "
                             "serving mode")
    parser.add_argument("--warmup", default=None,
                        help="comma-separated HxW sizes to precompile before "
                             "serving, e.g. '1024x1024,768x1024'")
    parser.add_argument("--out", default="panel.png")
    args = parser.parse_args(argv)

    import jax
    from PIL import Image

    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from diffsensei_tpu.core.config import PipelineConfig
    from diffsensei_tpu.pipelines.pipeline import (
        DiffSenseiPipeline, PipelineModules)
    from diffsensei_tpu.serve.api import DiffSenseiServer, GenerationRequest
    from diffsensei_tpu.utils.load import load_weights_any

    if args.preset == "sdxl":
        # fast path: the porters build complete trees, so init only what the
        # checkpoint does not cover (skips the ~7 min UNet init trace)
        modules = PipelineModules.sdxl(jax.random.key(0), init="none")
        if args.weights:
            modules = load_weights_any(modules, args.weights)
        else:
            print("# WARNING: sdxl preset with no --weights serves "
                  "ZERO weights")
        modules.fill_missing_params(jax.random.key(0))
    else:
        modules = PipelineModules.tiny(jax.random.key(0))
        if args.weights:
            modules = load_weights_any(modules, args.weights)
    if args.quantize_unet:
        import dataclasses as _dc

        from diffsensei_tpu.models.quant_unet import quantize_unet_params
        modules.unet_params = quantize_unet_params(modules.unet_params)
        modules.unet = modules.unet.clone(
            config=_dc.replace(modules.unet.config, lora_rank=0),
            quantized=True)
    if args.tokenizer:
        from diffsensei_tpu.train.cli import _load_tokenizer
        modules.tokenizer = _load_tokenizer(
            args.tokenizer, modules.text_encoder.config.vocab_size)
        modules.tokenizer_2 = _load_tokenizer(
            args.tokenizer_2 or args.tokenizer,
            modules.text_encoder_2.config.vocab_size)

    agent, mllm_spec = None, None
    if args.agent_weights:
        from diffsensei_tpu.core.config import AgentConfig
        from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM
        from diffsensei_tpu.utils.load import load_agent_weights
        acfg = AgentConfig() if args.preset == "sdxl" else AgentConfig.tiny()
        if args.quantize_llm:
            # 13B-path memory discipline: never materialize bf16 LLM weights
            # on the chip — build abstract, port the checkpoint host-side,
            # quantize host-side (numpy), ship int8 + the small resamplers.
            import dataclasses as _dc

            from diffsensei_tpu.models.mllm.quant import quantize_agent
            agent = ContinuousLVLM.build(acfg, jax.random.key(1),
                                         abstract=True)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                agent = load_agent_weights(agent, args.agent_weights)
            for name in ("input_resampler_params", "output_resampler_params"):
                leaves = jax.tree_util.tree_leaves(getattr(agent, name))
                if any(isinstance(x, jax.ShapeDtypeStruct) for x in leaves):
                    raise SystemExit(f"--quantize-llm: agent checkpoint is "
                                     f"missing the {name.split('_par')[0]} "
                                     "group")
            agent = quantize_agent(agent, bits=args.quantize_llm_bits)
            agent = _dc.replace(
                agent,
                llm_params=jax.device_put(agent.llm_params),
                input_resampler_params=jax.device_put(
                    agent.input_resampler_params),
                output_resampler_params=jax.device_put(
                    agent.output_resampler_params))
        else:
            agent = load_agent_weights(
                ContinuousLVLM.build(acfg, jax.random.key(1)),
                args.agent_weights)
        if args.mllm_tokenizer:
            mllm_spec = mllm_spec_from_tokenizer(args.mllm_tokenizer)
    import dataclasses

    pcfg = PipelineConfig()
    if args.scheduler:
        pcfg = dataclasses.replace(pcfg, scheduler=args.scheduler)
    mesh = None
    if args.context_parallel:
        from diffsensei_tpu.parallel.mesh import MeshSpec, make_mesh
        devs = jax.devices()
        mesh = make_mesh(MeshSpec(data=len(devs), model=1), devs)
        pcfg = dataclasses.replace(pcfg, context_parallel=True)
        print(f"# context parallelism over {len(devs)} device(s)")
    server = DiffSenseiServer(DiffSenseiPipeline(modules, pcfg, mesh=mesh),
                              agent=agent, mllm_spec=mllm_spec)

    if args.warmup:
        sizes = [tuple(int(v) for v in hw.split("x"))
                 for hw in args.warmup.split(",")]
        print(f"# warming {len(sizes)} bucket program(s)...")
        server.warmup(sizes, num_inference_steps=args.steps)

    chars = [Image.open(p).convert("RGB") for p in args.char_image]
    req = GenerationRequest(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        height=args.height, width=args.width,
        num_inference_steps=args.steps, guidance_scale=args.guidance,
        num_samples=args.num_samples, seed=args.seed,
        character_images=chars,
        ip_bbox=_parse_bbox(args.ip_bbox),
        dialog_bbox=_parse_bbox(args.dialog_bbox),
        ip_scale=args.ip_scale,
        deep_cache_interval=args.deep_cache,
        deep_cache_split=args.deep_cache_split,
    )
    # tiny preset has no tokenizers: hash the prompt into ids
    if modules.tokenizer is None:
        import numpy as np
        vocab = modules.text_encoder.config.vocab_size

        def hash_ids(text):
            ids = np.zeros((1, 77), np.int32)
            for i, w in enumerate(str(text).split()[:75]):
                ids[0, i + 1] = (hash(w) % (vocab - 3)) + 1
            return jax.numpy.asarray(ids)

        req.prompt_ids = dict(
            ids=hash_ids(args.prompt), neg_ids=hash_ids(args.negative_prompt),
            ids_2=hash_ids(args.prompt),
            neg_ids_2=hash_ids(args.negative_prompt))

    images = server.generate_pil(req)
    base, ext = os.path.splitext(args.out)
    for i, img in enumerate(images):
        path = args.out if len(images) == 1 else f"{base}_{i}{ext}"
        img.save(path)
        print(f"saved {path} ({img.size[0]}x{img.size[1]})")


if __name__ == "__main__":
    main()
