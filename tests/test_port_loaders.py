"""Coverage for the DiffSensei checkpoint loaders in ``utils/port_torch``.

These are the functions that load the RELEASED DiffSensei artifact
(``pytorch_model.bin`` with ``{"image_proj", "unet_trained"}``, IP-Adapter
``{"image_proj", "ip_adapter"}`` splits, agent ``llm./input_resampler./
output_resampler.`` prefixes) — reference loaders
``src/models/utils.py:22-72``. Synthetic state dicts use the exact reference
key layouts.
"""

import numpy as np
import pytest

from diffsensei_tpu.core.config import UNetConfig
from diffsensei_tpu.utils import port_torch
from diffsensei_tpu.utils.port_torch import attn_processor_slots


def _fake_unet_params(cfg):
    """Minimal params tree with every attn2 the porters touch."""
    p = {}
    tl = cfg.transformer_layers_per_block
    n_levels = len(cfg.block_out_channels)
    mods = []
    for level in range(n_levels):
        if tl[level]:
            for j in range(cfg.layers_per_block):
                mods.append((f"down_{level}_attn_{j}", tl[level]))
    for rev, level in enumerate(reversed(range(n_levels))):
        if tl[level]:
            for j in range(cfg.layers_per_block + 1):
                mods.append((f"up_{rev}_attn_{j}", tl[level]))
    mods.append(("mid_attn", cfg.mid_transformer_layers))
    for mod, n in mods:
        p[mod] = {f"blocks_{k}": {"attn2": {}} for k in range(n)}
    return {"params": p}


def test_attn_processor_slots_sdxl_layout():
    """SDXL: 140 processor slots (attn1 + attn2 interleaved), cross-attn at
    every odd index 1..139 — the released IP-Adapter key layout — ordered
    down_blocks, up_blocks, THEN mid_block (diffusers named_children order)."""
    slots = attn_processor_slots(UNetConfig.sdxl())
    assert len(slots) == 140
    cross = [(i, m, k) for i, (m, k) in enumerate(slots) if m is not None]
    assert [i for i, *_ in cross] == list(range(1, 140, 2))
    assert len(cross) == 70
    assert slots[1] == ("down_1_attn_0", 0)
    assert slots[47] == ("down_2_attn_1", 9)     # last down slot
    assert slots[49] == ("up_0_attn_0", 0)       # up begins right after down
    assert slots[119] == ("up_1_attn_2", 1)      # last up slot
    assert slots[121] == ("mid_attn", 0)         # mid comes LAST
    assert slots[139] == ("mid_attn", 9)


def test_attn_processor_slots_tiny_layout():
    cfg = UNetConfig.tiny()
    slots = attn_processor_slots(cfg)
    assert slots == [
        (None, 0), ("down_1_attn_0", 0),
        (None, 0), ("up_0_attn_0", 0),
        (None, 0), ("up_0_attn_1", 0),
        (None, 0), ("mid_attn", 0),
    ]


def test_port_ip_adapter_roundtrip():
    """Reference-ordered ``{idx}.to_{k,v}_ip.weight`` keys land on the right
    modules; torch [out, in] transposes to flax [in, out]."""
    cfg = UNetConfig.tiny()
    params = _fake_unet_params(cfg)
    rng = np.random.default_rng(0)
    ip_sd = {}
    expect = {}
    for idx, (mod, k) in enumerate(attn_processor_slots(cfg)):
        if mod is None:
            continue
        kw = rng.normal(size=(8, 16)).astype(np.float32)
        vw = rng.normal(size=(8, 16)).astype(np.float32)
        ip_sd[f"{idx}.to_k_ip.weight"] = kw
        ip_sd[f"{idx}.to_v_ip.weight"] = vw
        expect[(mod, k)] = (kw, vw)

    out = port_torch.port_ip_adapter(ip_sd, params, cfg)
    for (mod, k), (kw, vw) in expect.items():
        attn = out["params"][mod][f"blocks_{k}"]["attn2"]
        np.testing.assert_array_equal(attn["to_k_ip"]["kernel"], kw.T)
        np.testing.assert_array_equal(attn["to_v_ip"]["kernel"], vw.T)


def test_port_ip_adapter_rejects_mismatched_indices():
    """Keys at attn1 (even) positions mean the index layout is wrong — the old
    silent-skip bug assigned released weights to wrong layers (ADVICE r1)."""
    cfg = UNetConfig.tiny()
    params = _fake_unet_params(cfg)
    ip_sd = {"0.to_k_ip.weight": np.zeros((8, 16), np.float32),
             "0.to_v_ip.weight": np.zeros((8, 16), np.float32)}
    with pytest.raises(ValueError, match="matched no attn2"):
        port_torch.port_ip_adapter(ip_sd, params, cfg)


def test_port_sdxl_unet_partial_overlay():
    """Stage-2 partial dict (diffusers-style to_k_ip names + dialog embedding)
    overlays in place; untouched params keep their values (strict=False,
    reference ``load_unet`` utils.py:22-25)."""
    cfg = UNetConfig.tiny()
    params = _fake_unet_params(cfg)
    params["params"]["dialog_bbox_embedding"] = np.zeros((4,), np.float32)
    sentinel = np.full((3, 3), 7.0, np.float32)
    params["params"]["conv_in"] = {"kernel": sentinel}

    rng = np.random.default_rng(1)
    kw = rng.normal(size=(8, 16)).astype(np.float32)
    vw = rng.normal(size=(8, 16)).astype(np.float32)
    emb = rng.normal(size=(4,)).astype(np.float32)
    sd = {
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k_ip.weight": kw,
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_v_ip.weight": vw,
        "mid_block.attentions.0.transformer_blocks.0.attn2.to_k_ip.weight": kw * 2,
        "mid_block.attentions.0.transformer_blocks.0.attn2.to_v_ip.weight": vw * 2,
        "up_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k_ip.weight": kw * 3,
        "up_blocks.0.attentions.1.transformer_blocks.0.attn2.to_v_ip.weight": vw * 3,
        "dialog_bbox_embedding": emb,
    }
    out, applied = port_torch.port_sdxl_unet_partial(sd, params, cfg)
    p = out["params"]
    np.testing.assert_array_equal(
        p["down_1_attn_0"]["blocks_0"]["attn2"]["to_k_ip"]["kernel"], kw.T)
    np.testing.assert_array_equal(
        p["mid_attn"]["blocks_0"]["attn2"]["to_v_ip"]["kernel"], (vw * 2).T)
    np.testing.assert_array_equal(
        p["up_0_attn_1"]["blocks_0"]["attn2"]["to_k_ip"]["kernel"], (kw * 3).T)
    np.testing.assert_array_equal(p["dialog_bbox_embedding"], emb)
    np.testing.assert_array_equal(p["conv_in"]["kernel"], sentinel)
    assert set(applied) == set(sd)


def test_port_diffsensei_ckpt():
    """Stage-2 training dict {"image_proj", "unet_trained"} with DDP
    ``module.`` prefixes (train.py:451-452 + load_ckpt utils.py:53-66)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from src.models.resampler import Resampler as RefResampler

    torch.manual_seed(3)
    ref = RefResampler(dim=48, depth=1, dim_head=8, heads=4, num_queries=4,
                       num_dummy_tokens=3, embedding_dim=40,
                       magi_embedding_dim=24, output_dim=32, ff_mult=2)
    image_proj_sd = {"module." + k: v for k, v in ref.state_dict().items()}

    cfg = UNetConfig.tiny()
    params = _fake_unet_params(cfg)
    params["params"]["dialog_bbox_embedding"] = np.zeros((4,), np.float32)
    emb = np.arange(4, dtype=np.float32)
    unet_sd = {"module.dialog_bbox_embedding": emb}

    ckpt = {"image_proj": image_proj_sd, "unet_trained": unet_sd}
    res_params, merged = port_torch.port_diffsensei_ckpt(
        ckpt, params, resampler_depth=1, cfg=cfg)
    np.testing.assert_array_equal(
        res_params["params"]["latents"],
        ref.state_dict()["latents"].numpy().reshape(4, 48))
    np.testing.assert_array_equal(
        merged["params"]["dialog_bbox_embedding"], emb)


def test_split_agent_ckpt():
    sd = {
        "module.llm.model.embed_tokens.weight": np.ones((4, 2)),
        "input_resampler.query": np.ones((3, 2)),
        "output_resampler.attn.in_proj_weight": np.ones((6, 2)),
        "unrelated.thing": np.zeros(1),
    }
    groups = port_torch.split_agent_ckpt(sd)
    assert set(groups["llm"]) == {"model.embed_tokens.weight"}
    assert set(groups["input_resampler"]) == {"query"}
    assert set(groups["output_resampler"]) == {"attn.in_proj_weight"}
