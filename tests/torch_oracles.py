"""Hand-written torch mirrors of the diffusers block math (test oracles).

diffusers is not installed in this image, so per-VERDICT-r1 #4 these minimal
modules re-state the block semantics the reference UNet/VAE inherit from
diffusers (``UNet2DConditionModel`` / ``AutoencoderKL``; reference
``src/models/unet.py:21,43,116-347``) with diffusers-compatible attribute
names, so their ``state_dict()`` feeds ``utils/port_torch`` directly. They are
NOT copies of diffusers code — each forward is the minimal statement of the
published architecture (GroupNorm(eps)-SiLU-Conv resnets with additive time
conditioning, pre-LN transformer blocks with GEGLU FF, single-head VAE
attention), written for tiny test configs.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention, diffusers naming (to_q/k/v bias-free, to_out.0)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None, bias=None):
        ctx = x if ctx is None else ctx
        b, s, d = x.shape
        hd = d // self.heads

        def split(t):
            return t.view(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), split(self.to_v(ctx))
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class MaskedIPAttention(nn.Module):
    """Reference ``MaskedIPAttnProcessor2_0`` math (attention_processor.py:
    213-258): one query, text attention + bias-masked IP attention combined
    as ``text + scale * ip`` before to_out."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_k_ip = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v_ip = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx_text, ctx_ip, ip_bias, ip_scale):
        b, s, d = x.shape
        hd = d // self.heads

        def split(t):
            return t.view(b, -1, self.heads, hd).transpose(1, 2)

        q = split(self.to_q(x))
        h = F.scaled_dot_product_attention(
            q, split(self.to_k(ctx_text)), split(self.to_v(ctx_text)))
        h_ip = F.scaled_dot_product_attention(
            q, split(self.to_k_ip(ctx_ip)), split(self.to_v_ip(ctx_ip)),
            attn_mask=ip_bias[:, None])
        h = h + ip_scale * h_ip
        return self.to_out[0](h.transpose(1, 2).reshape(b, s, d))


class GEGLUFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Identity(), nn.Identity(), nn.Linear(dim * mult, dim)])
        # net.0.proj naming (diffusers GEGLU holds the fused projection)
        self.net[0] = type("GEGLU", (nn.Module,), {})()
        self.net[0].proj = nn.Linear(dim, dim * mult * 2)

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = MaskedIPAttention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFeedForward(dim)

    def forward(self, x, ctx_text, ctx_ip, ip_bias, ip_scale):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx_text, ctx_ip, ip_bias, ip_scale)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """use_linear_projection=True variant (SDXL)."""

    def __init__(self, dim, ctx_dim, heads, num_layers, groups=8):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, heads)
             for _ in range(num_layers)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx_text, ctx_ip, ip_bias, ip_scale):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for blk in self.transformer_blocks:
            x = blk(x, ctx_text, ctx_ip, ip_bias, ip_scale)
        x = self.proj_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


def timestep_embedding(t, dim, max_period=10000.0):
    """diffusers ``Timesteps`` with flip_sin_to_cos=True, shift=0."""
    import math
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[..., None] * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, out_dim)
        self.linear_2 = nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class UNetMangaOracle(nn.Module):
    """Tiny SDXL-manga UNet forward: diffusers UNet2DCondition structure
    (reference ``src/models/unet.py:116-347``) + the two manga hooks
    (dialog-bbox embedding after conv_in, masked-IP cross-attention).
    State-dict keys follow diffusers naming so ``port_sdxl_unet`` loads it."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        g = cfg.norm_num_groups
        ted = cfg.time_embed_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chans[0], ted)
        self.add_embedding = TimestepEmbedding(cfg.addition_embed_input_dim,
                                               ted)
        self.dialog_bbox_embedding = nn.Parameter(torch.randn(chans[0]))

        tl = cfg.transformer_layers_per_block
        self.down_blocks = nn.ModuleList()
        prev = chans[0]
        for level, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock2D(prev, ch, ted, g))
                prev = ch
                if tl[level]:
                    blk.attentions.append(Transformer2DModel(
                        ch, cfg.cross_attention_dim, ch // cfg.head_dim,
                        tl[level], g))
            if level < len(chans) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)

        mid = chans[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(mid, mid, ted, g), ResnetBlock2D(mid, mid, ted, g)])
        self.mid_block.attentions = nn.ModuleList([Transformer2DModel(
            mid, cfg.cross_attention_dim, mid // cfg.head_dim,
            cfg.mid_transformer_layers, g)])

        self.up_blocks = nn.ModuleList()
        # skip channels in pop order mirror the down-path push order
        skip_chans = [chans[0]]
        for level, ch in enumerate(chans):
            skip_chans += [ch] * cfg.layers_per_block
            if level < len(chans) - 1:
                skip_chans.append(ch)
        x_ch = mid
        for rev, level in enumerate(reversed(range(len(chans)))):
            ch = chans[level]
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_chans.pop()
                blk.resnets.append(ResnetBlock2D(x_ch + skip, ch, ted, g))
                x_ch = ch
                if tl[level]:
                    blk.attentions.append(Transformer2DModel(
                        ch, cfg.cross_attention_dim, ch // cfg.head_dim,
                        tl[level], g))
            if level > 0:
                up = nn.Module()
                up.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def encode_dialog_bbox(self, x, dialog_bbox):
        """reference unet.py:88-114: int-floor bounds, write-not-accumulate."""
        b, c, h, w = x.shape
        add = torch.zeros_like(x)
        for i in range(b):
            for j in range(dialog_bbox.shape[1]):
                x1 = max(0, int(dialog_bbox[i, j, 0] * w))
                y1 = max(0, int(dialog_bbox[i, j, 1] * h))
                x2 = min(w, int(dialog_bbox[i, j, 2] * w))
                y2 = min(h, int(dialog_bbox[i, j, 3] * h))
                add[i, :, y1:y2, x1:x2] = \
                    self.dialog_bbox_embedding.view(c, 1, 1)
        return x + add

    def forward(self, sample, timesteps, ctx_text, pooled, time_ids,
                ctx_ip, ip_biases, ip_scale, dialog_bbox):
        cfg = self.cfg
        tl = cfg.transformer_layers_per_block
        temb = self.time_embedding(
            timestep_embedding(timesteps, cfg.block_out_channels[0]))
        tid = timestep_embedding(time_ids.reshape(-1),
                                 cfg.addition_time_embed_dim)
        add = torch.cat([pooled, tid.reshape(time_ids.shape[0], -1)], dim=-1)
        temb = temb + self.add_embedding(add)

        x = self.conv_in(sample)
        x = self.encode_dialog_bbox(x, dialog_bbox)

        skips = [x]
        for level, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if tl[level]:
                    x = blk.attentions[j](x, ctx_text, ctx_ip,
                                          ip_biases[level], ip_scale)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx_text, ctx_ip,
                                         ip_biases[len(tl) - 1], ip_scale)
        x = self.mid_block.resnets[1](x, temb)

        for rev, blk in enumerate(self.up_blocks):
            level = len(tl) - 1 - rev
            for j, res in enumerate(blk.resnets):
                x = res(torch.cat([x, skips.pop()], dim=1), temb)
                if tl[level]:
                    x = blk.attentions[j](x, ctx_text, ctx_ip,
                                          ip_biases[level], ip_scale)
            if hasattr(blk, "upsamplers"):
                # diffusers forwards upsample_size so odd skip sizes land
                # exactly (UNet2DConditionModel forward_upsample_size path)
                x = F.interpolate(x, size=skips[-1].shape[2:], mode="nearest")
                x = blk.upsamplers[0].conv(x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


class QwenPlainViT(nn.Module):
    """Reference Qwen-VL plain ViT (``qwen_visual.py:423-489``) with the
    PER-HEAD-interleaved fused qkv ``in_proj`` (``:190-199``): head h's rows
    of in_proj are [q_h; k_h; v_h], not [Q; K; V] thirds."""

    def __init__(self, image_size, patch_size, width, layers, heads):
        super().__init__()
        self.heads = heads
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        self.positional_embedding = nn.Parameter(
            torch.randn(256, width) * width ** -0.5)
        self.ln_pre = nn.LayerNorm(width, eps=1e-6)

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = nn.LayerNorm(width, eps=1e-6)
                self.attn = nn.Module()
                self.attn.in_proj = nn.Linear(width, 3 * width)
                self.attn.out_proj = nn.Linear(width, width)
                self.ln_2 = nn.LayerNorm(width, eps=1e-6)
                self.mlp = nn.Module()
                self.mlp.c_fc = nn.Linear(width, 4 * width)
                self.mlp.c_proj = nn.Linear(4 * width, width)

            def forward(blk, x):
                h = blk.ln_1(x)
                b, s, e = h.shape
                hn = e // heads
                mixed = blk.attn.in_proj(h).view(b, s, heads, 3 * hn)
                q, k, v = mixed.split(hn, dim=-1)      # per-head interleave
                q = q.permute(0, 2, 1, 3)
                k = k.permute(0, 2, 1, 3)
                v = v.permute(0, 2, 1, 3)
                o = F.scaled_dot_product_attention(q, k, v)
                o = o.permute(0, 2, 1, 3).reshape(b, s, e)
                x = x + blk.attn.out_proj(o)
                return x + blk.mlp.c_proj(F.gelu(blk.mlp.c_fc(blk.ln_2(x))))

        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [Block() for _ in range(layers)])

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        x = x + self.positional_embedding[None, : x.shape[1]]
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        return x


class VAEAttention(nn.Module):
    def __init__(self, c, groups=4):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        t = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        o = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return o.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class VAEDecoder(nn.Module):
    """diffusers AutoencoderKL decoder (nearest-x2 upsample + conv)."""

    def __init__(self, block_out_channels, latent_channels, layers_per_block,
                 groups, out_channels=3):
        super().__init__()
        chans = list(block_out_channels)
        mid = chans[-1]
        self.conv_in = nn.Conv2d(latent_channels, mid, 3, padding=1)

        class Mid(nn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [ResnetBlock2D(mid, mid, groups=groups, eps=1e-6),
                     ResnetBlock2D(mid, mid, groups=groups, eps=1e-6)])
                self.attentions = nn.ModuleList([VAEAttention(mid, groups)])

            def forward(self, x):
                x = self.resnets[0](x)
                x = self.attentions[0](x)
                return self.resnets[1](x)

        self.mid_block = Mid()

        self.up_blocks = nn.ModuleList()
        prev = mid
        for rev, ch in enumerate(reversed(chans)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(layers_per_block + 1):
                blk.resnets.append(
                    ResnetBlock2D(prev, ch, groups=groups, eps=1e-6))
                prev = ch
            if rev < len(chans) - 1:
                up = nn.Module()
                up.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, prev, eps=1e-6)
        self.conv_out = nn.Conv2d(prev, out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))
