"""Training entry point: ``python -m diffsensei_tpu.train.cli --config <yaml>``.

Covers the reference's three launch scripts (``scripts/train/train_t2i.py``,
``train.py``, ``train_mllm.py``) behind one config-driven CLI; the stage is the
``stage:`` key. YAML schema mirrors the reference's OmegaConf nesting
(``configs/train/diffsensei/*.yaml``): ``model / train_data / optimizer /
lr_scheduler`` groups + trainer flags, with an added ``weights:`` group that
ports PyTorch checkpoints (diffusers/DiffSensei) at startup.

Distribution: instead of ``accelerate launch --multi_gpu`` (reference
``README.md:127-149``) the same script runs on every topology — the mesh is
built from all visible devices and the step is jitted over it (DP over the
``data`` axis; see ``parallel/mesh.py``). Multi-host: ``jax.distributed.initialize``
is called automatically when the env declares a coordinator.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _maybe_init_distributed():
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def _hash_tokenizer(vocab_size: int = 49408, length: int = 77):
    """Fallback tokenizer for smoke tests without a CLIP vocab on disk."""
    def tok(text: str) -> np.ndarray:
        ids = np.zeros((length,), np.int32)
        ids[0] = vocab_size - 2                     # bos
        for i, word in enumerate(text.split()[: length - 2]):
            ids[i + 1] = (hash(word) % (vocab_size - 3)) + 1
        ids[min(len(text.split()) + 1, length - 1)] = vocab_size - 1  # eos
        return ids
    return tok


def _load_tokenizer(path: Optional[str], vocab_size: int):
    if path:
        from transformers import CLIPTokenizer
        tokenizer = CLIPTokenizer.from_pretrained(path)
        return lambda text: np.asarray(
            tokenizer(text, padding="max_length", max_length=77,
                      truncation=True, return_tensors="np").input_ids[0],
            np.int32)
    return _hash_tokenizer(vocab_size)


def build_models(model_cfg: Dict[str, Any], rng: jax.Array):
    """Build the diffusion stack from the ``model:`` group."""
    from diffsensei_tpu.pipelines.pipeline import PipelineModules

    lora_rank = 0
    if model_cfg.get("unet_trained_parameters") == "lora":
        # reference 'lora' mode (train.py:162-174): rank from model.lora_rank
        # (self_0.5.yaml:21); a zero rank under this mode would train only the
        # IP projections — reject it loudly.
        lora_rank = int(model_cfg.get("lora_rank", 0))
        if lora_rank <= 0:
            raise ValueError(
                "unet_trained_parameters: lora requires model.lora_rank > 0")

    preset = model_cfg.get("preset", "tiny")
    if preset == "tiny":
        return PipelineModules.tiny(rng, lora_rank=lora_rank)
    if preset == "sdxl":
        # params start as zeros trees; the ``weights:`` group overlays ported
        # checkpoints (utils.load). ``init: random`` trains from scratch.
        # ``param_dtype: bfloat16`` builds the trees directly in bf16 — the
        # single-chip training configuration (fp32-init-then-cast transiently
        # doubles the 10.4 GB UNet tree and OOMs a 16 GB chip).
        import jax.numpy as jnp
        pdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            model_cfg.get("param_dtype", "float32")]
        return PipelineModules.sdxl(rng, init=model_cfg.get("init", "zeros"),
                                    remat=bool(model_cfg.get("remat", False)),
                                    lora_rank=lora_rank,
                                    remat_policy=model_cfg.get("remat_policy"),
                                    param_dtype=pdt)
    raise ValueError(f"unknown model preset {preset}")


def apply_ported_weights(modules, weights_cfg: Dict[str, str]):
    from diffsensei_tpu.utils.load import apply_ported_weights as _apply
    return _apply(modules, weights_cfg)


def main(argv=None):
    from diffsensei_tpu.core.config import load_yaml_config
    from diffsensei_tpu.data.bucket_dataset import (
        BucketDatasetConfig, MangaTrainSizeBucketDataset)
    from diffsensei_tpu.data.loader import PrefetchLoader
    from diffsensei_tpu.models.schedulers import DDPMSchedule
    from diffsensei_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_params, unet_param_sharding_rules)
    from diffsensei_tpu.train.diffusion import (
        FrozenDiffusionStack, Stage2Config, TrainState, make_stage1_step,
        make_stage2_step)
    from diffsensei_tpu.train.optim import (
        make_lr_schedule, make_optimizer, unet_trainable_mask)
    from diffsensei_tpu.train.runner import RunConfig, run_training

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_train_steps", type=int, default=None)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args(argv)

    _maybe_init_distributed()
    from diffsensei_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = load_yaml_config(args.config)
    stage = cfg.get("stage", "condition")
    trainer = dict(cfg.get("trainer", {}))
    if args.max_train_steps is not None:
        trainer["max_train_steps"] = args.max_train_steps
    if args.log_dir is not None:
        trainer["log_dir"] = args.log_dir
    if args.resume:
        trainer["resume"] = True

    rng = jax.random.key(int(trainer.get("seed", 0)))
    modules = build_models(cfg.get("model", {}), rng)
    modules = apply_ported_weights(modules, cfg.get("weights", {}))
    if modules.unet.config.lora_rank > 0 and modules.unet_params is not None:
        # ported/zeros trees carry missing or dead (all-zero) adapters;
        # gaussian-init them (reference init_lora_weights, train.py:170)
        from diffsensei_tpu.models.lora import ensure_lora_init
        ensure_lora_init(modules.unet_params, modules.unet.config.lora_rank,
                         seed=int(trainer.get("seed", 0)))
    manga = modules.manga

    # data ------------------------------------------------------------------
    mesh = make_mesh()
    td = dict(cfg.get("train_data", {}))
    ds_cfg = BucketDatasetConfig(
        data_parallel=mesh.shape["data"],
        t_drop_rate=td.get("t_drop_rate", 0.05),
        i_drop_rate=td.get("i_drop_rate", 0.05),
        c_drop_rate=td.get("c_drop_rate", 0.05),
        max_num_ips=manga.max_num_ips,
        max_num_ip_sources=td.get("max_num_ip_sources", 1),
        max_num_dialogs=manga.max_num_dialogs,
        mask_dialog=td.get("mask_dialog", False),
        ip_self_condition_rate=td.get("ip_self_condition_rate", 0.5),
        ip_flip_rate=td.get("ip_flip_rate", 0.5),
        batch_size=td.get("batch_size", 8),
    )
    tokenize = _load_tokenizer(td.get("tokenizer_path"),
                               modules.text_encoder.config.vocab_size)
    tokenize_2 = _load_tokenizer(td.get("tokenizer_2_path"),
                                 modules.text_encoder_2.config.vocab_size)
    dataset = MangaTrainSizeBucketDataset(
        ann_path=td["ann_path"], image_root=td.get("image_root", ""),
        tokenize=tokenize, tokenize_2=tokenize_2, config=ds_cfg)

    num_workers = int(td.get("num_workers", 8))
    host_id, num_hosts = jax.process_index(), jax.process_count()
    loader = PrefetchLoader(
        lambda seed: dataset.batches(shuffle=True, seed=seed,
                                     num_workers=num_workers,
                                     host_id=host_id, num_hosts=num_hosts),
        num_epochs=None, device_put=lambda b: shard_batch(b, mesh),
        seed=int(trainer.get("seed", 0)))

    # frozen stack + step ----------------------------------------------------
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
        vae_scaling=modules.vae.config.scaling_factor,
    )
    schedule = DDPMSchedule()
    mcfg = dict(cfg.get("model", {}))
    opt_cfg = dict(cfg.get("optimizer", {}))
    lr_cfg = dict(cfg.get("lr_scheduler", {}))
    lr = make_lr_schedule(
        lr_cfg.get("name", "constant_with_warmup"),
        float(opt_cfg.get("lr", 1e-4)),
        num_warmup_steps=int(lr_cfg.get("num_warmup_steps", 0)),
        num_training_steps=int(trainer.get("max_train_steps", 1000)),
        min_lr_ratio=float(lr_cfg.get("min_lr_ratio", 0.0)))

    if stage == "t2i":
        step_fn = make_stage1_step(modules.unet, schedule,
                                   remat_unet=mcfg.get("remat", False))
        params = modules.unet_params
        mask = unet_trainable_mask(params,
                                   mcfg.get("unet_trained_parameters", "full"))
    elif stage == "condition":
        from diffsensei_tpu.train.optim import partition_params

        s2 = Stage2Config(
            manga=manga,
            max_num_sources=ds_cfg.max_num_ip_sources,
            ip_contrastive=mcfg.get("ip_contrastive_loss"),
            ip_contrastive_weight=mcfg.get("ip_contrastive_loss_weight", 0.1),
            remat_unet=mcfg.get("remat", False))
        mode = mcfg.get("unet_trained_parameters", "new")
        step_fn = make_stage2_step(modules.unet, modules.resampler,
                                   schedule, s2)
        if mode == "full":
            params = {"unet": modules.unet_params,
                      "resampler": modules.resampler_params}
            mask = None
        else:
            # partitioned training: gradients/optimizer state only for the
            # trainable subtree (no optax masking needed)
            umask = unet_trainable_mask(modules.unet_params, mode)
            t_flat, f_flat = partition_params(modules.unet_params, umask)
            frozen = frozen.replace(unet_frozen_flat=f_flat)
            params = {"unet": t_flat,
                      "resampler": modules.resampler_params}
            mask = None
    elif stage == "mllm":
        from diffsensei_tpu.core.config import (
            AgentConfig, LlamaConfig, QwenResamplerConfig)
        from diffsensei_tpu.data.mllm_dataset import (
            MLLMTokenSpec, MangaTrainMLLMDataset)
        from diffsensei_tpu.models.mllm.peft import lora_trainable_mask
        from diffsensei_tpu.models.mllm.seed_x import ContinuousLVLM
        from diffsensei_tpu.train.mllm_step import (
            Stage3Config, make_stage3_step)

        agent_cfg = mcfg.get("agent", {})
        iv = manga.num_ip_tokens
        if mcfg.get("preset", "tiny") == "tiny":
            llm = LlamaConfig.tiny()
            cross = modules.unet.config.cross_attention_dim
            acfg = AgentConfig(
                llm=llm,
                input_resampler=QwenResamplerConfig(
                    grid_size=2, num_queries_override=iv,
                    embed_dim=llm.hidden_size, num_heads=4, kv_dim=cross),
                output_resampler=QwenResamplerConfig(
                    grid_size=2, num_queries_override=iv,
                    embed_dim=cross, num_heads=4, kv_dim=llm.hidden_size))
        else:
            acfg = AgentConfig()   # SEED-X scale; weights must be ported
        agent = ContinuousLVLM.build(
            acfg, jax.random.fold_in(rng, 3),
            lora_rank=agent_cfg.get("lora_rank", acfg.lora.rank),
            remat=bool(agent_cfg.get("remat", True)),
            remat_policy=agent_cfg.get("remat_policy"))

        # MLLM token spec: top-of-vocab ladder ids (a ported tokenizer
        # supplies real ids via train_data.mllm_ladder_ids)
        vocab = acfg.llm.vocab_size
        n_img = iv
        ladder = list(td.get(
            "mllm_ladder_ids", range(vocab - n_img - 2, vocab)))
        spec = MLLMTokenSpec(
            bos_id=td.get("mllm_bos_id", 1),
            eos_id=td.get("mllm_eos_id", 2),
            pad_id=td.get("mllm_pad_id", 0),
            boi_id=ladder[0], eoi_id=ladder[-1], img_ids=ladder[1:-1],
            encode_text=lambda s: [(hash(w) % (vocab - n_img - 10)) + 3
                                   for w in s.split()])
        dataset = MangaTrainMLLMDataset(
            ann_path=td["ann_path"], image_root=td.get("image_root", ""),
            tokenize=tokenize, tokenize_2=tokenize_2, config=ds_cfg,
            mllm_spec=spec,
            max_token_length=td.get("max_token_length", 400))
        loader = PrefetchLoader(
            lambda seed: dataset.batches(
                shuffle=True, seed=seed,
                num_workers=int(td.get("num_workers", 8)),
                host_id=jax.process_index(), num_hosts=jax.process_count()),
            num_epochs=None, device_put=lambda b: shard_batch(b, mesh),
            seed=int(trainer.get("seed", 0)))

        s3 = Stage3Config(manga=manga,
                          mllm_loss_weight=mcfg.get("mllm_loss_weight", 1.0),
                          remat_unet=mcfg.get("remat", False))
        frozen = frozen.replace(unet_params=modules.unet_params,
                                resampler_params=modules.resampler_params)
        step_fn = make_stage3_step(
            modules.unet, modules.resampler, agent, schedule, s3)
        params = {"llm": agent.llm_params,
                  "input_resampler": agent.input_resampler_params,
                  "output_resampler": agent.output_resampler_params}
        mask = {"llm": lora_trainable_mask(agent.llm_params),
                "input_resampler": jax.tree.map(
                    lambda _: True, agent.input_resampler_params),
                "output_resampler": jax.tree.map(
                    lambda _: True, agent.output_resampler_params)}
    else:
        raise ValueError(f"unknown stage {stage}")

    import optax
    tx = make_optimizer(
        lr, weight_decay=float(opt_cfg.get("weight_decay", 1e-2)),
        max_grad_norm=opt_cfg.get("max_grad_norm", 1.0),
        trainable_mask=mask)
    accum = int(trainer.get("gradient_accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    # parallel: dp (default, reference DDP semantics: replicated params) or
    # fsdp (ZeRO-3: params/grads/moments sharded over the data axis — the
    # config SDXL full fine-tune needs, since replicated AdamW state cannot
    # fit a 16 GB chip; see parallel/mesh.py::fsdp_spec).
    parallel = trainer.get("parallel", "dp")
    if parallel == "fsdp":
        from diffsensei_tpu.parallel.mesh import (
            FSDP_MIN_SIZE, shard_params_fsdp)
        fsdp_min = int(trainer.get("fsdp_min_size", FSDP_MIN_SIZE))
        params = shard_params_fsdp(params, mesh, fsdp_min)
        frozen = shard_params_fsdp(frozen, mesh, fsdp_min)
    elif parallel == "dp":
        params = shard_params(params, mesh, unet_param_sharding_rules())
    else:
        raise ValueError(f"unknown trainer.parallel: {parallel!r} "
                         "(expected 'dp' or 'fsdp')")
    state = TrainState.create(params, tx)
    if parallel == "fsdp":
        # AdamW moments mirror the param shapes — shard them the same way
        # (ZeRO optimizer-state sharding; optax.init gives no guarantee of
        # inheriting the input sharding).
        state = state.replace(
            opt_state=shard_params_fsdp(state.opt_state, mesh, fsdp_min))

    run_cfg = RunConfig(
        max_train_steps=int(trainer.get("max_train_steps", 1000)),
        log_dir=trainer.get("log_dir", "logs/run"),
        log_every=int(trainer.get("log_every", 50)),
        checkpoint_every=int(trainer.get("checkpoint_every",
                                         trainer.get("checkpointing_interval",
                                                     1000))),
        checkpoint_steps=tuple(trainer.get("checkpointing_steps", ()) or ()),
        checkpoints_total_limit=trainer.get("checkpoints_total_limit", 5),
        seed=int(trainer.get("seed", 0)),
        resume=bool(trainer.get("resume", False)),
    )
    with mesh:
        run_training(step_fn, state, iter(loader), run_cfg, frozen=frozen)


if __name__ == "__main__":
    main()
