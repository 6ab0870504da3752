"""Test-local PyTorch transcriptions of the reference's block math.

These are the golden-parity oracles (VERDICT round-1 item 1): hand-written
torch modules reproducing the forward-pass tensor math of the diffusers-0.32.2
blocks the reference instruments, with parameter names chosen to match the
diffusers checkpoint key layout so ``models/convert.py`` can map their
state_dicts onto our Flax templates unchanged.  Each class cites the reference
file whose behavior it transcribes.  Nothing here is imported from diffusers —
torch (CPU) is used purely as a numerical oracle.

Every module optionally fills a ``taps`` dict with the same layer-id grammar
the framework emits, so tests can compare tap VALUES key-by-key.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


# ------------------------------------------------------------------ embeddings
def timestep_embedding(timesteps: torch.Tensor, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: int = 10000) -> torch.Tensor:
    """diffusers ``get_timestep_embedding`` (embeddings.py) numerics."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)[None, :] * timesteps.float()[:, None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> act -> linear_2 (diffusers TimestepEmbedding)."""

    def __init__(self, in_dim: int, embed_dim: int, act: str = 'silu'):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)
        self.act = act

    def forward(self, x):
        x = self.linear_1(x)
        x = F.gelu(x) if self.act == 'gelu' else F.silu(x)
        return self.linear_2(x)


# ---------------------------------------------------------------------- resnet
class ResnetBlock2D(nn.Module):
    """Transcribes reference feature/diffusers/models/resnet.py:320-380
    (time_embedding_norm='default'): norm1 -> silu -> conv1 -> (+temb) ->
    norm2 -> silu -> conv2; taps 'increment' (pre-residual) and 'out'
    (:371-377)."""

    def __init__(self, in_ch: int, out_ch: int, temb_dim: int | None = None,
                 eps: float = 1e-5, groups: int = 32,
                 output_scale_factor: float = 1.0):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = (nn.Linear(temb_dim, out_ch)
                              if temb_dim is not None else None)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)
        self.output_scale_factor = output_scale_factor

    def forward(self, x, temb=None, taps=None, prefix=''):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if taps is not None:
            taps[f'{prefix}increment'] = h
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        out = (x + h) / self.output_scale_factor
        if taps is not None:
            taps[f'{prefix}out'] = out
        return out


# ------------------------------------------------------------------- attention
class Attention(nn.Module):
    """Transcribes AttnProcessor2_0 / AttnStoreProcessor math
    (reference feature/diffusers/models/attention_processor.py:3291-3294 for
    q/k/v tap placement; feature/components/attention.py:223-247 for the
    explicit-softmax score path).  q/k/v taps observe the pre-head-split
    (B, S, inner) projections."""

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 cross_dim: int | None = None, qkv_bias: bool = False,
                 out_bias: bool = True):
        super().__init__()
        inner = heads * dim_head
        ctx_dim = cross_dim if cross_dim is not None else query_dim
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_q = nn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_v = nn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=out_bias)])

    def forward(self, x, ctx=None, mask=None, taps=None, prefix=''):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        if taps is not None:
            taps[f'{prefix}q'] = q
            taps[f'{prefix}k'] = k
            taps[f'{prefix}v'] = v
        b, sq, inner = q.shape
        hd = inner // self.heads
        qh = q.view(b, -1, self.heads, hd).transpose(1, 2)
        kh = k.view(b, -1, self.heads, hd).transpose(1, 2)
        vh = v.view(b, -1, self.heads, hd).transpose(1, 2)
        # explicit softmax so the probability tensor is comparable (the
        # reference's my_scaled_dot_product_attention, attention.py:265-292)
        scores = qh @ kh.transpose(-1, -2) * self.scale
        if mask is not None:
            scores = scores + mask
        probs = scores.softmax(dim=-1)
        if taps is not None:
            taps[f'{prefix}map'] = probs
        out = (probs @ vh).transpose(1, 2).reshape(b, sq, inner)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU MLP; 'ffn-inner' tap fires after net[0]
    (reference feature/diffusers/models/attention.py:1253-1257)."""

    def __init__(self, dim: int, mult: int = 4, inner: int | None = None):
        super().__init__()
        inner = dim * mult if inner is None else inner
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x, taps=None, prefix=''):
        h = self.net[0](x)
        if taps is not None:
            taps[f'{prefix}inner'] = h
        return self.net[2](h)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> FF with residuals; 'out'
    tap at block end (reference feature/diffusers/models/attention.py:589-590)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 cross_dim: int | None = None, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn1 = Attention(dim, heads, dim_head)
        self.has_cross = cross_dim is not None
        if self.has_cross:
            self.norm2 = nn.LayerNorm(dim, eps=eps)
            self.attn2 = Attention(dim, heads, dim_head, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim, eps=eps)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx=None, mask=None, taps=None, prefix=''):
        x = x + self.attn1(self.norm1(x), None, taps=taps,
                           prefix=f'{prefix}self-')
        if self.has_cross:
            x = x + self.attn2(self.norm2(x), ctx, mask, taps=taps,
                               prefix=f'{prefix}cross-')
        x = x + self.ff(self.norm3(x), taps=taps, prefix=f'{prefix}ffn-')
        if taps is not None:
            taps[f'{prefix}out'] = x
        return x


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in -> blocks -> proj_out (+residual); 'out' tap on
    the post-residual NCHW output (reference
    feature/diffusers/models/transformers/transformer_2d.py:474-475)."""

    def __init__(self, in_ch: int, heads: int, dim_head: int, depth: int = 1,
                 cross_dim: int | None = None, use_linear_projection: bool = False):
        super().__init__()
        inner = heads * dim_head
        self.use_linear = use_linear_projection
        self.norm = nn.GroupNorm(32, in_ch, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(in_ch, inner)
            self.proj_out = nn.Linear(inner, in_ch)
        else:
            self.proj_in = nn.Conv2d(in_ch, inner, 1)
            self.proj_out = nn.Conv2d(inner, in_ch, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner, heads, dim_head, cross_dim=cross_dim)
            for _ in range(depth)])

    def forward(self, x, ctx=None, mask=None, taps=None, prefix=''):
        b, c, hh, ww = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            inner = h.shape[1]
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, inner)
        for i, blk in enumerate(self.transformer_blocks):
            h = blk(h, ctx, mask, taps=taps, prefix=f'{prefix}block{i}-')
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            inner = h.shape[-1]
            h = h.reshape(b, hh, ww, inner).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        out = h + residual
        if taps is not None:
            taps[f'{prefix}out'] = out
        return out


# ---------------------------------------------------------------------- U-Net
class _DownBlock(nn.Module):
    def __init__(self, cfg, level: int, in_ch: int, out_ch: int,
                 add_downsample: bool, has_attn: bool):
        super().__init__()
        temb_dim = cfg['block_out_channels'][0] * 4
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if r == 0 else out_ch, out_ch,
                          temb_dim=temb_dim)
            for r in range(cfg['layers_per_block'])])
        self.has_attn = has_attn
        if has_attn:
            heads = cfg['num_attention_heads'][level]
            self.attentions = nn.ModuleList([
                Transformer2DModel(
                    out_ch, heads, out_ch // heads,
                    depth=cfg['transformer_layers_per_block'][level],
                    cross_dim=cfg['cross_attention_dim'],
                    use_linear_projection=cfg['use_linear_projection'])
                for _ in range(cfg['layers_per_block'])])
        if add_downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None
        self.level = level

    def forward(self, x, temb, ctx, taps=None):
        outs = []
        for r, res in enumerate(self.resnets):
            p = f'down-level{self.level}-repeat{r}-'
            x = res(x, temb, taps=taps, prefix=f'{p}res-')
            if self.has_attn:
                x = self.attentions[r](x, ctx, taps=taps, prefix=f'{p}vit-')
            outs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0].conv(x)
            if taps is not None:
                taps[f'down-level{self.level}-downsampler-out'] = x
            outs.append(x)
        return x, outs


class _MidBlock(nn.Module):
    def __init__(self, cfg, ch: int):
        super().__init__()
        temb_dim = cfg['block_out_channels'][0] * 4
        heads = cfg['num_attention_heads'][-1]
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, temb_dim=temb_dim),
            ResnetBlock2D(ch, ch, temb_dim=temb_dim)])
        self.attentions = nn.ModuleList([
            Transformer2DModel(
                ch, heads, ch // heads,
                depth=cfg['transformer_layers_per_block'][-1],
                cross_dim=cfg['cross_attention_dim'],
                use_linear_projection=cfg['use_linear_projection'])])

    def forward(self, x, temb, ctx, taps=None):
        x = self.resnets[0](x, temb, taps=taps, prefix='mid-repeat0-res-')
        x = self.attentions[0](x, ctx, taps=taps, prefix='mid-vit-')
        x = self.resnets[1](x, temb, taps=taps, prefix='mid-repeat1-res-')
        return x


class _UpBlock(nn.Module):
    def __init__(self, cfg, level: int, in_ch: int, prev_ch: int, out_ch: int,
                 add_upsample: bool, has_attn: bool, heads: int, depth: int):
        super().__init__()
        temb_dim = cfg['block_out_channels'][0] * 4
        n = cfg['layers_per_block'] + 1
        self.resnets = nn.ModuleList([])
        for r in range(n):
            skip = in_ch if r == n - 1 else out_ch
            res_in = prev_ch if r == 0 else out_ch
            self.resnets.append(
                ResnetBlock2D(res_in + skip, out_ch, temb_dim=temb_dim))
        self.has_attn = has_attn
        if has_attn:
            self.attentions = nn.ModuleList([
                Transformer2DModel(
                    out_ch, heads, out_ch // heads, depth=depth,
                    cross_dim=cfg['cross_attention_dim'],
                    use_linear_projection=cfg['use_linear_projection'])
                for _ in range(n)])
        if add_upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None
        self.level = level

    def forward(self, x, skips, temb, ctx, taps=None):
        for r, res in enumerate(self.resnets):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            p = f'up-level{self.level}-repeat{r}-'
            x = res(x, temb, taps=taps, prefix=f'{p}res-')
            if self.has_attn:
                x = self.attentions[r](x, ctx, taps=taps, prefix=f'{p}vit-')
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode='nearest')
            x = self.upsamplers[0].conv(x)
            if taps is not None:
                taps[f'up-level{self.level}-upsampler-out'] = x
        return x


class UNet2DConditionModel(nn.Module):
    """Tiny-config transcription of the reference overlay U-Net
    (feature/diffusers/models/unet/unet_2d_condition.py:1169-1310): root taps
    'unet-in' / 'unet-after-conv-in' / 'unet-out', SDXL 'text_time'
    micro-conditioning (reference feature/diffusion_feature.py:534-571)."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg['block_out_channels'][0]
        temb_dim = ch0 * 4
        self.conv_in = nn.Conv2d(cfg['in_channels'], ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim)
        if cfg.get('addition_embed_type') == 'text_time':
            self.add_embedding = TimestepEmbedding(
                cfg['projection_class_embeddings_input_dim'], temb_dim)

        self.down_blocks = nn.ModuleList([])
        ch = ch0
        n_down = len(cfg['down_block_types'])
        for level, btype in enumerate(cfg['down_block_types']):
            out_ch = cfg['block_out_channels'][level]
            self.down_blocks.append(_DownBlock(
                cfg, level, ch, out_ch,
                add_downsample=level != n_down - 1,
                has_attn=btype == 'CrossAttnDownBlock2D'))
            ch = out_ch

        self.mid_block = _MidBlock(cfg, cfg['block_out_channels'][-1])

        rev = list(reversed(cfg['block_out_channels']))
        rev_heads = list(reversed(cfg['num_attention_heads']))
        rev_depth = list(reversed(cfg['transformer_layers_per_block']))
        self.up_blocks = nn.ModuleList([])
        prev = rev[0]
        for level, btype in enumerate(cfg['up_block_types']):
            out_ch = rev[level]
            in_ch = rev[min(level + 1, len(rev) - 1)]
            self.up_blocks.append(_UpBlock(
                cfg, level, in_ch, prev, out_ch,
                add_upsample=level != len(cfg['up_block_types']) - 1,
                has_attn=btype == 'CrossAttnUpBlock2D',
                heads=rev_heads[level], depth=rev_depth[level]))
            prev = out_ch

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=cfg.get('norm_eps', 1e-5))
        self.conv_out = nn.Conv2d(ch0, cfg['out_channels'], 3, padding=1)

    def forward(self, sample, timestep, ctx, added_cond=None, taps=None):
        cfg = self.cfg
        if taps is not None:
            taps['unet-in'] = sample
        b = sample.shape[0]
        ts = torch.full((b,), float(timestep))
        temb = self.time_embedding(
            timestep_embedding(ts, cfg['block_out_channels'][0]))
        if cfg.get('addition_embed_type') == 'text_time':
            time_embeds = timestep_embedding(
                added_cond['time_ids'].reshape(-1),
                cfg['addition_time_embed_dim']).reshape(b, -1)
            add_embeds = torch.cat([added_cond['text_embeds'], time_embeds],
                                   dim=-1)
            temb = temb + self.add_embedding(add_embeds)

        x = self.conv_in(sample)
        if taps is not None:
            taps['unet-after-conv-in'] = x
        skips = [x]
        for blk in self.down_blocks:
            x, outs = blk(x, temb, ctx, taps=taps)
            skips.extend(outs)
        x = self.mid_block(x, temb, ctx, taps=taps)
        n = cfg['layers_per_block'] + 1
        for blk in self.up_blocks:
            block_skips = skips[-n:]
            skips = skips[:-n]
            x = blk(x, block_skips, temb, ctx, taps=taps)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        if taps is not None:
            taps['unet-out'] = x
        return x


# ------------------------------------------------------------------------ VAE
class _VAEResnet(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, eps: float = 1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _VAEAttention(nn.Module):
    """Single-head spatial attention (diffusers VAE mid block: Attention with
    heads=1, residual added inside the processor)."""

    def __init__(self, ch: int, eps: float = 1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=eps)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])
        self.scale = ch ** -0.5

    def forward(self, x):
        b, c, hh, ww = x.shape
        res = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        probs = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = self.to_out[0](probs @ v)
        return out.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, layers: int,
                 add_downsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList([
            _VAEResnet(in_ch if r == 0 else out_ch, out_ch)
            for r in range(layers)])
        if add_downsample:
            ds = nn.Module()
            # diffusers VAE Downsample2D: padding=0 + manual (0,1,0,1) pad
            ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _VAEMidBlock(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.resnets = nn.ModuleList([_VAEResnet(ch, ch), _VAEResnet(ch, ch)])
        self.attentions = nn.ModuleList([_VAEAttention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEEncoder(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        chans = cfg['block_out_channels']
        self.conv_in = nn.Conv2d(cfg['in_channels'], chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList([])
        ch = chans[0]
        for level, out_ch in enumerate(chans):
            self.down_blocks.append(_VAEDownBlock(
                ch, out_ch, cfg['layers_per_block'],
                add_downsample=level != len(chans) - 1))
            ch = out_ch
        self.mid_block = _VAEMidBlock(ch)
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, cfg['latent_channels'] * 2, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLEncoder(nn.Module):
    """Encoder + quant_conv -> moments (diffusers AutoencoderKL.encode with
    use_quant_conv=True, the SD/SDXL checkpoint configuration)."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.encoder = _VAEEncoder(cfg)
        self.quant_conv = nn.Conv2d(cfg['latent_channels'] * 2,
                                    cfg['latent_channels'] * 2, 1)

    def forward(self, images):
        return self.quant_conv(self.encoder(images))


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, layers: int,
                 add_upsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList([
            _VAEResnet(in_ch if r == 0 else out_ch, out_ch)
            for r in range(layers + 1)])
        if add_upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode='nearest')
            x = self.upsamplers[0].conv(x)
        return x


class _VAEDecoder(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        rev = list(reversed(cfg['block_out_channels']))
        self.conv_in = nn.Conv2d(cfg['latent_channels'], rev[0], 3, padding=1)
        self.mid_block = _VAEMidBlock(rev[0])
        self.up_blocks = nn.ModuleList([])
        ch = rev[0]
        for level, out_ch in enumerate(rev):
            self.up_blocks.append(_VAEUpBlock(
                ch, out_ch, cfg['layers_per_block'],
                add_upsample=level != len(rev) - 1))
            ch = out_ch
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, cfg.get('out_channels', 3), 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLDecoder(nn.Module):
    """post_quant_conv + decoder (diffusers AutoencoderKL.decode with
    use_quant_conv=True) — the 'vae-out' pseudo-layer path
    (feature/diffusion_feature.py:477-485)."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.post_quant_conv = nn.Conv2d(cfg['latent_channels'],
                                         cfg['latent_channels'], 1)
        self.decoder = _VAEDecoder(cfg)

    def forward(self, z):
        return self.decoder(self.post_quant_conv(z))


def state_dict_numpy(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------- PixArt DiT
class PixArtFeedForward(nn.Module):
    """PixArt FFN: GELU(tanh) proj -> linear (diffusers FeedForward with
    activation_fn='gelu-approximate'); 'ffn-inner' tap after net[0]."""

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
        proj = nn.Module()
        proj.proj = nn.Linear(dim, inner)
        self.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x, taps=None, prefix=''):
        h = F.gelu(self.net[0].proj(x), approximate='tanh')
        if taps is not None:
            taps[f'{prefix}inner'] = h
        return self.net[2](h)


class PixArtBlock(nn.Module):
    """BasicTransformerBlock with norm_type='ada_norm_single' (reference
    feature/diffusers/models/attention.py:497-594): per-block
    scale_shift_table + shared 6*dim timestep modulation; NO norm before
    cross-attention; gated self-attn and FFN residuals; 'out' tap at end."""

    def __init__(self, dim: int, heads: int, dim_head: int, cross_dim: int):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim ** 0.5)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.attn1 = Attention(dim, heads, dim_head, qkv_bias=True)
        self.attn2 = Attention(dim, heads, dim_head, cross_dim=cross_dim,
                               qkv_bias=True)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.ff = PixArtFeedForward(dim)

    def forward(self, x, ctx, t6, mask=None, taps=None, prefix=''):
        b = x.shape[0]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            self.scale_shift_table[None] + t6.reshape(b, 6, -1)).chunk(6, dim=1)
        h = self.norm1(x) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h, taps=taps, prefix=f'{prefix}self-')
        x = x + self.attn2(x, ctx, mask, taps=taps, prefix=f'{prefix}cross-')
        h = self.norm2(x) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * self.ff(h, taps=taps, prefix=f'{prefix}ffn-')
        if taps is not None:
            taps[f'{prefix}out'] = x
        return x


def pixart_sincos_pos_embed(dim, grid, base_size, interpolation_scale):
    """diffusers get_2d_sincos_pos_embed (MAE lineage): grid[0] = column."""
    import numpy as np
    g = np.arange(grid, dtype=np.float64) / (grid / base_size) / interpolation_scale
    col, row = np.meshgrid(g, g)

    def embed_1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum('m,d->md', pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([embed_1d(dim // 2, col), embed_1d(dim // 2, row)],
                          axis=1)


class PixArtTransformer2DModel(nn.Module):
    """Tiny-config transcription of the PixArt pipeline's transformer
    forward: patchify + sincos positions, AdaLayerNormSingle, caption
    projection, blocks, modulated final norm, unpatchify (learned sigma
    kept: out_channels = 2x latent)."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.cfg = cfg
        dim = cfg['num_attention_heads'] * cfg['attention_head_dim']
        pe = nn.Module()
        pe.proj = nn.Conv2d(cfg['in_channels'], dim, cfg['patch_size'],
                            stride=cfg['patch_size'])
        self.pos_embed = pe
        ada = nn.Module()
        emb = nn.Module()
        emb.timestep_embedder = TimestepEmbedding(256, dim)
        ada.emb = emb
        ada.linear = nn.Linear(dim, 6 * dim)
        self.adaln_single = ada
        cap = nn.Module()
        cap.linear_1 = nn.Linear(cfg['caption_channels'], dim)
        cap.linear_2 = nn.Linear(dim, dim)
        self.caption_projection = cap
        self.transformer_blocks = nn.ModuleList([
            PixArtBlock(dim, cfg['num_attention_heads'],
                        cfg['attention_head_dim'], dim)
            for _ in range(cfg['num_layers'])])
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim) / dim ** 0.5)
        self.norm_out = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.proj_out = nn.Linear(
            dim, cfg['patch_size'] ** 2 * cfg['out_channels'])

    def forward(self, sample, timestep, ctx, mask=None, taps=None):
        cfg = self.cfg
        b, c, hh, ww = sample.shape
        p = cfg['patch_size']
        gh = hh // p
        dim = self.proj_out.in_features
        x = self.pos_embed.proj(sample)
        x = x.flatten(2).transpose(1, 2)          # (b, T, dim)
        pos = pixart_sincos_pos_embed(dim, gh, cfg['sample_size'] // p,
                                      cfg['interpolation_scale'])
        x = x + torch.tensor(pos, dtype=x.dtype)[None]

        ts = torch.full((b,), float(timestep))
        emb = self.adaln_single.emb.timestep_embedder(
            timestep_embedding(ts, 256))
        t6 = self.adaln_single.linear(F.silu(emb))
        ctx = self.caption_projection.linear_2(
            F.gelu(self.caption_projection.linear_1(ctx), approximate='tanh'))

        for i, blk in enumerate(self.transformer_blocks):
            x = blk(x, ctx, t6, mask, taps=taps, prefix=f'vit-block{i}-')

        shift, scale = (self.scale_shift_table[None]
                        + emb[:, None]).chunk(2, dim=1)
        h = self.norm_out(x) * (1 + scale) + shift
        h = self.proj_out(h)
        h = h.reshape(b, gh, gh, p, p, cfg['out_channels'])
        h = torch.einsum('bhwpqc->bchpwq', h).reshape(
            b, cfg['out_channels'], gh * p, gh * p)
        return h


# ------------------------------------------------------------------ Flux MMDiT
def flux_rope_cos_sin(ids, axes_dim, theta=10000.0):
    """FluxPosEmbed numerics: per-axis angles, repeat-interleaved to the
    real form (torch tensors, fp64 accumulation like the reference)."""
    import numpy as np
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.asarray(ids[:, i], np.float64)[:, None] * freqs[None, :]
        coss.append(np.repeat(np.cos(ang), 2, axis=1))
        sins.append(np.repeat(np.sin(ang), 2, axis=1))
    cos = torch.tensor(np.concatenate(coss, 1), dtype=torch.float32)
    sin = torch.tensor(np.concatenate(sins, 1), dtype=torch.float32)
    return cos, sin


def flux_apply_rope(x, cos, sin):
    """diffusers apply_rotary_emb(use_real, use_real_unbind_dim=-1):
    x (B, H, S, D), cos/sin (S, D)."""
    xf = x.float()
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    rotated = torch.stack([-x2, x1], dim=-1).flatten(3)
    return (xf * cos[None, None] + rotated * sin[None, None]).to(x.dtype)


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + self.eps)
        return x * self.weight


class FluxGELUProj(nn.Module):
    """FeedForward(activation_fn='gelu-approximate')."""

    def __init__(self, dim, inner):
        super().__init__()
        proj = nn.Module()
        proj.proj = nn.Linear(dim, inner)
        self.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x, taps=None, prefix=''):
        h = F.gelu(self.net[0].proj(x), approximate='tanh')
        if taps is not None:
            taps[f'{prefix}inner'] = h
        return self.net[2](h)


class FluxJointAttention(nn.Module):
    """FluxAttnProcessor2_0 with the store-processor's taps (reference
    feature/diffusers/models/attention_processor.py:2280-2361 +
    components/attention.py:404-527): image-stream q/k/v taps, RMS qk-norms,
    joint [text; image] sequence with RoPE, cross/self map split,
    post-projection attn-out."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.norm_q = TorchRMSNorm(dim_head)
        self.norm_k = TorchRMSNorm(dim_head)
        self.add_q_proj = nn.Linear(dim, inner)
        self.add_k_proj = nn.Linear(dim, inner)
        self.add_v_proj = nn.Linear(dim, inner)
        self.norm_added_q = TorchRMSNorm(dim_head)
        self.norm_added_k = TorchRMSNorm(dim_head)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])
        self.to_add_out = nn.Linear(inner, dim)

    def _split(self, t):
        b, s, inner = t.shape
        return t.view(b, s, self.heads, self.dim_head).transpose(1, 2)

    def forward(self, img, ctx, cos, sin, taps=None, prefix=''):
        q, k, v = self.to_q(img), self.to_k(img), self.to_v(img)
        if taps is not None:
            taps[f'{prefix}q'] = q
            taps[f'{prefix}k'] = k
            taps[f'{prefix}v'] = v
        qh = self.norm_q(self._split(q))
        kh = self.norm_k(self._split(k))
        vh = self._split(v)
        cqh = self.norm_added_q(self._split(self.add_q_proj(ctx)))
        ckh = self.norm_added_k(self._split(self.add_k_proj(ctx)))
        cvh = self._split(self.add_v_proj(ctx))
        tl = ctx.shape[1]
        qj = torch.cat([cqh, qh], dim=2)
        kj = torch.cat([ckh, kh], dim=2)
        vj = torch.cat([cvh, vh], dim=2)
        qj = flux_apply_rope(qj, cos, sin)
        kj = flux_apply_rope(kj, cos, sin)
        scores = qj @ kj.transpose(-1, -2) * self.dim_head ** -0.5
        probs = scores.softmax(dim=-1)
        if taps is not None:
            taps[f'{prefix}cross-map'] = probs[:, :, tl:, :tl]
            taps[f'{prefix}self-map'] = probs[:, :, tl:, tl:]
        out = probs @ vj
        b, _, s, _ = out.shape
        out = out.transpose(1, 2).reshape(b, s, -1)
        ctx_out, img_out = out[:, :tl], out[:, tl:]
        img_out = self.to_out[0](img_out)
        if taps is not None:
            taps[f'{prefix}attn-out'] = img_out
        return img_out, self.to_add_out(ctx_out)


class FluxTransformerBlock(nn.Module):
    """Dual-stream MMDiT block (reference transformer_flux.py:120-215):
    AdaLayerNormZero on both streams; taps 'norm-out' (post-norm2 modulated)
    and — quirk — 'out' gathers the SAME tensor, not the residual output."""

    def __init__(self, dim, heads, dim_head, mlp_ratio=4.0):
        super().__init__()
        n1 = nn.Module()
        n1.linear = nn.Linear(dim, 6 * dim)
        self.norm1 = n1
        n1c = nn.Module()
        n1c.linear = nn.Linear(dim, 6 * dim)
        self.norm1_context = n1c
        self.attn = FluxJointAttention(dim, heads, dim_head)
        self.ln = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        inner = int(dim * mlp_ratio)
        self.ff = FluxGELUProj(dim, inner)
        self.ff_context = FluxGELUProj(dim, inner)

    def forward(self, img, ctx, temb, cos, sin, taps=None, prefix=''):
        st = F.silu(temb)
        sh, sc, g, sh2, sc2, g2 = self.norm1.linear(st).chunk(6, dim=-1)
        csh, csc, cg, csh2, csc2, cg2 = self.norm1_context.linear(st).chunk(6, dim=-1)
        nimg = self.ln(img) * (1 + sc[:, None]) + sh[:, None]
        nctx = self.ln(ctx) * (1 + csc[:, None]) + csh[:, None]
        a_img, a_ctx = self.attn(nimg, nctx, cos, sin, taps=taps, prefix=prefix)
        img = img + g[:, None] * a_img
        norm_h = self.ln(img) * (1 + sc2[:, None]) + sh2[:, None]
        if taps is not None:
            taps[f'{prefix}norm-out'] = norm_h
        img = img + g2[:, None] * self.ff(norm_h, taps=taps,
                                          prefix=f'{prefix}ffn-')
        if taps is not None:
            taps[f'{prefix}out'] = norm_h     # reference :210-211 quirk
        ctx = ctx + cg[:, None] * a_ctx
        nctx2 = self.ln(ctx) * (1 + csc2[:, None]) + csh2[:, None]
        ctx = ctx + cg2[:, None] * self.ff_context(nctx2)
        return img, ctx


class FluxSingleTransformerBlock(nn.Module):
    """Single-stream block (reference transformer_flux.py:40-110): parallel
    attention (pre_only, no out-proj) + MLP, fused gated projection; taps
    text-sliced q/k/v, maps, attn-out, and 'out' (:107-108)."""

    def __init__(self, dim, heads, dim_head, text_len, mlp_ratio=4.0):
        super().__init__()
        n = nn.Module()
        n.linear = nn.Linear(dim, 3 * dim)
        self.norm = n
        self.ln = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        inner = heads * dim_head
        mlp = int(dim * mlp_ratio)
        self.proj_mlp = nn.Linear(dim, mlp)
        attn = nn.Module()
        attn.to_q = nn.Linear(dim, inner)
        attn.to_k = nn.Linear(dim, inner)
        attn.to_v = nn.Linear(dim, inner)
        attn.norm_q = TorchRMSNorm(dim_head)
        attn.norm_k = TorchRMSNorm(dim_head)
        self.attn = attn
        self.proj_out = nn.Linear(inner + mlp, dim)
        self.heads, self.dim_head, self.text_len = heads, dim_head, text_len

    def forward(self, x, temb, cos, sin, taps=None, prefix=''):
        residual = x
        tl = self.text_len
        sh, sc, g = self.norm.linear(F.silu(temb)).chunk(3, dim=-1)
        nx = self.ln(x) * (1 + sc[:, None]) + sh[:, None]
        mlp = F.gelu(self.proj_mlp(nx), approximate='tanh')
        q, k, v = self.attn.to_q(nx), self.attn.to_k(nx), self.attn.to_v(nx)
        if taps is not None:
            taps[f'{prefix}q'] = q[:, tl:]
            taps[f'{prefix}k'] = k[:, tl:]
            taps[f'{prefix}v'] = v[:, tl:]
        b, s, inner = q.shape

        def split(t):
            return t.view(b, s, self.heads, self.dim_head).transpose(1, 2)

        qh = flux_apply_rope(self.attn.norm_q(split(q)), cos, sin)
        kh = flux_apply_rope(self.attn.norm_k(split(k)), cos, sin)
        vh = split(v)
        scores = qh @ kh.transpose(-1, -2) * self.dim_head ** -0.5
        probs = scores.softmax(dim=-1)
        if taps is not None:
            taps[f'{prefix}cross-map'] = probs[:, :, tl:, :tl]
            taps[f'{prefix}self-map'] = probs[:, :, tl:, tl:]
        out = (probs @ vh).transpose(1, 2).reshape(b, s, inner)
        if taps is not None:
            taps[f'{prefix}attn-out'] = out[:, tl:]
        h = torch.cat([out, mlp], dim=2)
        x = residual + g[:, None] * self.proj_out(h)
        if taps is not None:
            taps[f'{prefix}out'] = x[:, tl:]
        return x


class FluxTransformer2DModel(nn.Module):
    """Tiny-config transcription of the Flux forward (reference
    transformer_flux.py:400-560): x/context embedders, combined
    timestep+guidance+pooled conditioning, dual then single blocks,
    AdaLayerNormContinuous output."""

    def __init__(self, cfg: dict, text_len: int):
        super().__init__()
        self.cfg = cfg
        dim = cfg['num_attention_heads'] * cfg['attention_head_dim']
        self.x_embedder = nn.Linear(cfg['in_channels'], dim)
        tte = nn.Module()
        tte.timestep_embedder = TimestepEmbedding(256, dim)
        tte.guidance_embedder = TimestepEmbedding(256, dim)
        te = nn.Module()
        te.linear_1 = nn.Linear(cfg['pooled_projection_dim'], dim)
        te.linear_2 = nn.Linear(dim, dim)
        tte.text_embedder = te
        self.time_text_embed = tte
        self.context_embedder = nn.Linear(cfg['joint_attention_dim'], dim)
        heads, hd = cfg['num_attention_heads'], cfg['attention_head_dim']
        self.transformer_blocks = nn.ModuleList([
            FluxTransformerBlock(dim, heads, hd)
            for _ in range(cfg['num_layers'])])
        self.single_transformer_blocks = nn.ModuleList([
            FluxSingleTransformerBlock(dim, heads, hd, text_len)
            for _ in range(cfg['num_single_layers'])])
        no = nn.Module()
        no.linear = nn.Linear(dim, 2 * dim)
        self.norm_out = no
        self.ln = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.proj_out = nn.Linear(dim, cfg['in_channels'])
        self.text_len = text_len

    def forward(self, packed, timestep, ctx, pooled, cos, sin,
                guidance=1000.0, taps=None):
        b = packed.shape[0]
        x = self.x_embedder(packed)
        ts = torch.full((b,), float(timestep))
        temb = self.time_text_embed.timestep_embedder(
            timestep_embedding(ts, 256))
        gg = torch.full((b,), float(guidance))
        temb = temb + self.time_text_embed.guidance_embedder(
            timestep_embedding(gg, 256))
        temb = temb + self.time_text_embed.text_embedder.linear_2(
            F.silu(self.time_text_embed.text_embedder.linear_1(pooled)))
        ctx = self.context_embedder(ctx)
        for i, blk in enumerate(self.transformer_blocks):
            x, ctx = blk(x, ctx, temb, cos, sin, taps=taps,
                         prefix=f'vit-block{i}-')
        h = torch.cat([ctx, x], dim=1)
        nd = len(self.transformer_blocks)
        for j, blk in enumerate(self.single_transformer_blocks):
            h = blk(h, temb, cos, sin, taps=taps,
                    prefix=f'vit-block{nd + j}-')
        h = h[:, self.text_len:]
        scale, shift = self.norm_out.linear(F.silu(temb)).chunk(2, dim=-1)
        h = self.ln(h) * (1 + scale[:, None]) + shift[:, None]
        return self.proj_out(h)


# ------------------------------------------------------- Hunyuan attention
class HunyuanAttention(nn.Module):
    """Transcribes HunyuanAttnStoreProcessor (reference
    feature/components/attention.py:294-401): q/k/v taps pre-head-split,
    per-head LayerNorm qk-norm, RoPE on q always and on k only for
    self-attention, explicit softmax with per-head 'map' tap."""

    def __init__(self, dim: int, heads: int, dim_head: int, is_cross: bool,
                 kv_dim: int | None = None):
        super().__init__()
        kv_dim = dim if kv_dim is None else kv_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(kv_dim, dim)
        self.to_v = nn.Linear(kv_dim, dim)
        self.norm_q = nn.LayerNorm(dim_head, eps=1e-6)
        self.norm_k = nn.LayerNorm(dim_head, eps=1e-6)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.heads, self.dim_head, self.is_cross = heads, dim_head, is_cross

    def forward(self, x, ctx=None, cos=None, sin=None, taps=None, prefix=''):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        if taps is not None:
            taps[f'{prefix}q'] = q
            taps[f'{prefix}k'] = k
            taps[f'{prefix}v'] = v
        b = x.shape[0]

        def split(t):
            return t.view(b, -1, self.heads, self.dim_head).transpose(1, 2)

        qh = self.norm_q(split(q))
        kh = self.norm_k(split(k))
        vh = split(v)
        if cos is not None:
            qh = flux_apply_rope(qh, cos, sin)
            if not self.is_cross:
                kh = flux_apply_rope(kh, cos, sin)
        scores = qh @ kh.transpose(-1, -2) * self.dim_head ** -0.5
        probs = scores.softmax(dim=-1)
        if taps is not None:
            taps[f'{prefix}map'] = probs
        out = (probs @ vh).transpose(1, 2).reshape(b, -1,
                                                   self.heads * self.dim_head)
        return self.to_out[0](out)


# ----------------------------------------------------------------- ControlNet
class ControlNetConditioningEmbedding(nn.Module):
    """diffusers ControlNetConditioningEmbedding: conv_in -> silu ->
    [block -> silu]* -> conv_out (image-space condition down to latent res)."""

    def __init__(self, out_ch: int, blocks=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, blocks[0], 3, padding=1)
        self.blocks = nn.ModuleList([])
        for i in range(len(blocks) - 1):
            self.blocks.append(nn.Conv2d(blocks[i], blocks[i], 3, padding=1))
            self.blocks.append(
                nn.Conv2d(blocks[i], blocks[i + 1], 3, stride=2, padding=1))
        self.conv_out = nn.Conv2d(blocks[-1], out_ch, 3, padding=1)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class ControlNetModel(nn.Module):
    """Transcription of diffusers ControlNetModel.forward (the U-Net encoder
    copy + per-skip zero convs the reference wraps in ControlNetBase.encode,
    feature/components/controlnet.py:13-24): conv_in + cond-embedding add,
    down blocks, mid block, 1x1 projection per skip and for mid, all scaled
    by conditioning_scale."""

    def __init__(self, cfg: dict, cond_blocks=(16, 32, 96, 256)):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg['block_out_channels'][0]
        temb_dim = ch0 * 4
        self.conv_in = nn.Conv2d(cfg['in_channels'], ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim)
        if cfg.get('addition_embed_type') == 'text_time':
            self.add_embedding = TimestepEmbedding(
                cfg['projection_class_embeddings_input_dim'], temb_dim)
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            ch0, cond_blocks)

        self.down_blocks = nn.ModuleList([])
        skip_chs = [ch0]
        ch = ch0
        n_down = len(cfg['down_block_types'])
        for level, btype in enumerate(cfg['down_block_types']):
            out_ch = cfg['block_out_channels'][level]
            add_ds = level != n_down - 1
            self.down_blocks.append(_DownBlock(
                cfg, level, ch, out_ch, add_downsample=add_ds,
                has_attn=btype == 'CrossAttnDownBlock2D'))
            skip_chs.extend([out_ch] * cfg['layers_per_block'])
            if add_ds:
                skip_chs.append(out_ch)
            ch = out_ch
        self.mid_block = _MidBlock(cfg, cfg['block_out_channels'][-1])

        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in skip_chs])
        last = cfg['block_out_channels'][-1]
        self.controlnet_mid_block = nn.Conv2d(last, last, 1)

    def forward(self, sample, timestep, ctx, cond, scale=1.0, added_cond=None):
        cfg = self.cfg
        b = sample.shape[0]
        ts = torch.full((b,), float(timestep))
        temb = self.time_embedding(
            timestep_embedding(ts, cfg['block_out_channels'][0]))
        if cfg.get('addition_embed_type') == 'text_time':
            time_embeds = timestep_embedding(
                added_cond['time_ids'].reshape(-1),
                cfg['addition_time_embed_dim']).reshape(b, -1)
            temb = temb + self.add_embedding(
                torch.cat([added_cond['text_embeds'], time_embeds], dim=-1))

        x = self.conv_in(sample)
        x = x + self.controlnet_cond_embedding(cond)
        skips = [x]
        for blk in self.down_blocks:
            x, outs = blk(x, temb, ctx)
            skips.extend(outs)
        x = self.mid_block(x, temb, ctx)
        down = tuple(conv(s) * scale
                     for conv, s in zip(self.controlnet_down_blocks, skips))
        mid = self.controlnet_mid_block(x) * scale
        return down, mid


# ------------------------------------------------------------ DeepFloyd IF
class IFResnet(nn.Module):
    """ResnetBlock2D with time_embedding_norm='scale_shift' and optional
    in-block avg-pool/nearest resampling (IF's ResnetDownsample/Upsample
    families, use_conv=False); GELU activations (act_fn='gelu')."""

    def __init__(self, in_ch: int, out_ch: int, temb_dim: int,
                 eps: float = 1e-5, down: bool = False, up: bool = False):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch * 2)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)
        self.down, self.up = down, up

    def forward(self, x, temb, taps=None, prefix=''):
        h = F.gelu(self.norm1(x))
        if self.down:
            h = F.avg_pool2d(h, 2)
            x = F.avg_pool2d(x, 2)
        elif self.up:
            h = F.interpolate(h, scale_factor=2.0, mode='nearest')
            x = F.interpolate(x, scale_factor=2.0, mode='nearest')
        h = self.conv1(h)
        t = self.time_emb_proj(F.gelu(temb))[:, :, None, None]
        scale, shift = torch.chunk(t, 2, dim=1)
        h = self.conv2(F.gelu(self.norm2(h) * (1 + scale) + shift))
        if taps is not None:
            taps[f'{prefix}increment'] = h
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        out = x + h
        if taps is not None:
            taps[f'{prefix}out'] = out
        return out


class IFAddedKVAttention(nn.Module):
    """AttnAddedKVProcessor math: token-wise GroupNorm, queries from image
    tokens, keys/values = [projected text; image], residual add."""

    def __init__(self, ch: int, head_dim: int, cross_dim: int,
                 eps: float = 1e-5):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=eps)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.add_k_proj = nn.Linear(cross_dim, ch)
        self.add_v_proj = nn.Linear(cross_dim, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])
        self.heads = ch // head_dim
        self.head_dim = head_dim

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = x.reshape(b, c, hh * ww)
        h = self.group_norm(h).transpose(1, 2)            # (b, s, c)
        q = self.to_q(h)
        k = torch.cat([self.add_k_proj(ctx), self.to_k(h)], dim=1)
        v = torch.cat([self.add_v_proj(ctx), self.to_v(h)], dim=1)

        def split(t):
            return t.reshape(b, -1, self.heads, self.head_dim).permute(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        w = (qh.float() @ kh.float().transpose(-1, -2)
             * self.head_dim ** -0.5).softmax(dim=-1)
        a = (w @ vh.float()).to(v.dtype)
        a = a.permute(0, 2, 1, 3).reshape(b, hh * ww, c)
        out = self.to_out[0](a)
        return out.transpose(1, 2).reshape(b, c, hh, ww) + res


class IFTextTimeEmbedding(nn.Module):
    """TextTimeEmbedding (addition_embed_type='text'): LN -> attention
    pooling (mean class token + positional embedding, 1/sqrt(sqrt(d)) scale
    on q AND k) -> proj -> LN.  Module names flatten to our flax params
    (pool_q_proj etc.)."""

    def __init__(self, embed_dim: int, time_embed_dim: int, num_heads: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(embed_dim)
        self.pool_positional_embedding = nn.Parameter(
            torch.randn(1, embed_dim) / embed_dim ** 0.5)
        self.pool_q_proj = nn.Linear(embed_dim, embed_dim)
        self.pool_k_proj = nn.Linear(embed_dim, embed_dim)
        self.pool_v_proj = nn.Linear(embed_dim, embed_dim)
        self.proj = nn.Linear(embed_dim, time_embed_dim)
        self.norm2 = nn.LayerNorm(time_embed_dim)
        self.num_heads = num_heads

    def forward(self, text):
        x = self.norm1(text)
        b, _, d = x.shape
        class_token = x.mean(dim=1, keepdim=True) \
            + self.pool_positional_embedding[None]
        xc = torch.cat([class_token, x], dim=1)
        hd = d // self.num_heads
        scale = 1.0 / hd ** 0.25

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).permute(0, 2, 1, 3)

        qh = split(self.pool_q_proj(class_token)) * scale
        kh = split(self.pool_k_proj(xc)) * scale
        vh = split(self.pool_v_proj(xc))
        w = (qh.float() @ kh.float().transpose(-1, -2)).softmax(dim=-1)
        a = (w @ vh.float()).to(vh.dtype)
        pooled = a.permute(0, 2, 1, 3).reshape(b, -1, d)[:, 0]
        return self.norm2(self.proj(pooled))


class IFUNet(nn.Module):
    """Tiny-config transcription of DeepFloyd IF stage-I's UNet2DCondition
    configuration (pixel-space, scale-shift resnets, added-KV attention,
    encoder_hid_proj, attention-pooled text added embedding; reference zoo
    entry feature/components/models.py:119-133).  Module names flatten to
    our IFUNet param paths."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.cfg = cfg
        chans = cfg['block_out_channels']
        ch0 = chans[0]
        temb_dim = ch0 * 4
        self.conv_in = nn.Conv2d(cfg['in_channels'], ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim, act='gelu')
        self.add_embedding = IFTextTimeEmbedding(
            cfg['encoder_hid_dim'], temb_dim,
            cfg['addition_embed_type_num_heads'])
        self.encoder_hid_proj = nn.Linear(cfg['encoder_hid_dim'],
                                          cfg['cross_attention_dim'])
        hd = cfg['attention_head_dim']
        cd = cfg['cross_attention_dim']
        lp = cfg['layers_per_block']

        self.down_blocks = nn.ModuleList([])
        ch = ch0
        for level, btype in enumerate(cfg['down_block_types']):
            out_ch = chans[level]
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                IFResnet(ch if r == 0 else out_ch, out_ch, temb_dim)
                for r in range(lp)])
            if btype == 'SimpleCrossAttnDownBlock2D':
                blk.attentions = nn.ModuleList([
                    IFAddedKVAttention(out_ch, hd, cd) for _ in range(lp)])
            if level != len(chans) - 1:
                blk.downsamplers = nn.ModuleList([
                    IFResnet(out_ch, out_ch, temb_dim, down=True)])
            self.down_blocks.append(blk)
            ch = out_ch

        mid = nn.Module()
        mid.resnets = nn.ModuleList([IFResnet(ch, ch, temb_dim),
                                     IFResnet(ch, ch, temb_dim)])
        mid.attentions = nn.ModuleList([IFAddedKVAttention(ch, hd, cd)])
        self.mid_block = mid

        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList([])
        prev = rev[0]
        for level, btype in enumerate(cfg['up_block_types']):
            out_ch = rev[level]
            in_ch = rev[min(level + 1, len(chans) - 1)]
            blk = nn.Module()
            blk.resnets = nn.ModuleList([])
            n = lp + 1
            for r in range(n):
                skip = in_ch if r == n - 1 else out_ch
                res_in = prev if r == 0 else out_ch
                blk.resnets.append(IFResnet(res_in + skip, out_ch, temb_dim))
            if btype == 'SimpleCrossAttnUpBlock2D':
                blk.attentions = nn.ModuleList([
                    IFAddedKVAttention(out_ch, hd, cd) for _ in range(n)])
            if level != len(cfg['up_block_types']) - 1:
                blk.upsamplers = nn.ModuleList([
                    IFResnet(out_ch, out_ch, temb_dim, up=True)])
            self.up_blocks.append(blk)
            prev = out_ch

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=cfg.get('norm_eps', 1e-5))
        self.conv_out = nn.Conv2d(ch0, cfg['out_channels'], 3, padding=1)

    def forward(self, sample, timestep, text, taps=None):
        cfg = self.cfg
        if taps is not None:
            taps['unet-in'] = sample
        b = sample.shape[0]
        ts = torch.full((b,), float(timestep))
        temb = self.time_embedding(
            timestep_embedding(ts, cfg['block_out_channels'][0]))
        temb = temb + self.add_embedding(text)
        ctx = self.encoder_hid_proj(text)

        x = self.conv_in(sample)
        if taps is not None:
            taps['unet-after-conv-in'] = x
        skips = [x]
        for level, blk in enumerate(self.down_blocks):
            for r, res in enumerate(blk.resnets):
                p = f'down-level{level}-repeat{r}-res-'
                x = res(x, temb, taps=taps, prefix=p)
                if hasattr(blk, 'attentions'):
                    x = blk.attentions[r](x, ctx)
                skips.append(x)
            if hasattr(blk, 'downsamplers'):
                x = blk.downsamplers[0](
                    x, temb, taps=taps,
                    prefix=f'down-level{level}-downsampler-')
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb, taps=taps,
                                      prefix='mid-repeat0-res-')
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb, taps=taps,
                                      prefix='mid-repeat1-res-')

        for level, blk in enumerate(self.up_blocks):
            for r, res in enumerate(blk.resnets):
                skip = skips.pop()
                x = torch.cat([x, skip], dim=1)
                x = res(x, temb, taps=taps,
                        prefix=f'up-level{level}-repeat{r}-res-')
                if hasattr(blk, 'attentions'):
                    x = blk.attentions[r](x, ctx)
            if hasattr(blk, 'upsamplers'):
                x = blk.upsamplers[0](x, temb, taps=taps,
                                      prefix=f'up-level{level}-upsampler-')
        out = self.conv_out(F.gelu(self.conv_norm_out(x)))
        if taps is not None:
            taps['unet-out'] = out
        return out


class HunyuanDiTBlock(nn.Module):
    """HunyuanDiTBlock: optional U-ViT skip (cat -> LN -> linear),
    AdaLayerNormShift self-attention, plain-LN cross-attention, GEGLU FF."""

    def __init__(self, dim: int, heads: int, mlp_ratio: float,
                 with_skip: bool, eps: float = 1e-6,
                 cross_dim: int | None = None):
        super().__init__()
        hd = dim // heads
        if with_skip:
            self.skip_norm = nn.LayerNorm(2 * dim, eps=eps)
            self.skip_linear = nn.Linear(2 * dim, dim)
        n1 = nn.Module()
        n1.linear = nn.Linear(dim, dim)
        n1.norm = nn.LayerNorm(dim, eps=eps)
        self.norm1 = n1
        self.attn1 = HunyuanAttention(dim, heads, hd, is_cross=False)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.attn2 = HunyuanAttention(dim, heads, hd, is_cross=True,
                                      kv_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim, eps=eps)
        self.ff = FeedForward(dim, inner=int(dim * mlp_ratio))
        self.with_skip = with_skip

    def forward(self, x, ctx, temb, cos, sin, skip=None, taps=None,
                prefix=''):
        if self.with_skip:
            x = self.skip_linear(self.skip_norm(torch.cat([x, skip], dim=-1)))
        shift = self.norm1.linear(F.silu(temb.float()).to(temb.dtype))
        h = self.norm1.norm(x) + shift[:, None]
        x = x + self.attn1(h, None, cos, sin, taps=taps,
                           prefix=f'{prefix}self-')
        h = self.norm2(x)
        x = x + self.attn2(h, ctx, cos, sin, taps=taps,
                           prefix=f'{prefix}cross-')
        h = self.norm3(x)
        x = x + self.ff(h, taps=taps, prefix=f'{prefix}ffn-')
        # NO block-level 'out' tap: HunyuanDiTBlock is outside the overlay
        return x


class HunyuanAttentionPool(nn.Module):
    """HunyuanDiTAttentionPool over the T5 sequence (CLIP lineage): mean
    token prepended, positional embedding added to ALL tokens."""

    def __init__(self, seq_len: int, embed_dim: int, heads: int,
                 output_dim: int):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(seq_len + 1, embed_dim) / embed_dim ** 0.5)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.heads = heads

    def forward(self, x):
        b, s, c = x.shape
        x = torch.cat([x.mean(dim=1, keepdim=True), x], dim=1) \
            + self.positional_embedding[None].to(x.dtype)
        hd = c // self.heads

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

        qh = split(self.q_proj(x[:, :1]))
        kh = split(self.k_proj(x))
        vh = split(self.v_proj(x))
        w = (qh.float() @ kh.float().transpose(-1, -2) * hd ** -0.5
             ).softmax(dim=-1)
        a = (w @ vh.float()).to(vh.dtype)
        a = a.transpose(1, 2).reshape(b, -1, c)
        return self.c_proj(a)[:, 0]


class HunyuanDiT2DModel(nn.Module):
    """Tiny-config transcription of diffusers HunyuanDiT2DModel (reference
    zoo entry feature/components/models.py:134-149): patch embed, combined
    timestep/pooled-T5/meta-size/style conditioning, BERT+projected-T5 text
    context with learned padding row, U-ViT long skips, AdaLN-continuous
    output + unpatchify."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.cfg = cfg
        dim = cfg['hidden_size']
        p = cfg['patch_size']
        pe = nn.Module()
        pe.proj = nn.Conv2d(cfg['in_channels'], dim, p, stride=p)
        self.pos_embed = pe
        tee = nn.Module()
        tee.timestep_embedder = TimestepEmbedding(256, dim)
        tee.pooler = HunyuanAttentionPool(
            cfg['text_len_t5'], cfg['cross_attention_dim_t5'], 8,
            cfg['pooled_projection_dim'])
        tee.style_embedder = nn.Embedding(1, dim)
        ee = nn.Module()
        extra_in = cfg['pooled_projection_dim'] + 6 * 256 + dim
        ee.linear_1 = nn.Linear(extra_in, dim * 4)
        ee.linear_2 = nn.Linear(dim * 4, dim)
        tee.extra_embedder = ee
        self.time_extra_emb = tee
        te = nn.Module()
        te.linear_1 = nn.Linear(cfg['cross_attention_dim_t5'],
                                cfg['cross_attention_dim_t5'] * 4)
        te.linear_2 = nn.Linear(cfg['cross_attention_dim_t5'] * 4,
                                cfg['cross_attention_dim'])
        self.text_embedder = te
        self.text_embedding_padding = nn.Parameter(
            torch.randn(cfg['text_len'] + cfg['text_len_t5'],
                        cfg['cross_attention_dim']) * 0.02)
        half = cfg['num_layers'] // 2
        self.blocks = nn.ModuleList([
            HunyuanDiTBlock(dim, cfg['num_attention_heads'],
                            cfg['mlp_ratio'], with_skip=i > half,
                            cross_dim=cfg['cross_attention_dim'])
            for i in range(cfg['num_layers'])])
        no = nn.Module()
        no.linear = nn.Linear(dim, 2 * dim)
        self.norm_out = no
        self.ln = nn.LayerNorm(dim, eps=cfg.get('norm_eps', 1e-6),
                               elementwise_affine=False)
        self.proj_out = nn.Linear(dim, p * p * cfg['out_channels'])

    def forward(self, sample, timestep, bert_ctx, t5_ctx, cos, sin,
                bert_mask=None, t5_mask=None, taps=None):
        cfg = self.cfg
        b, c, hh, ww = sample.shape
        p = cfg['patch_size']
        gh, gw = hh // p, ww // p
        x = self.pos_embed.proj(sample)
        x = x.flatten(2).transpose(1, 2)                 # (b, gh*gw, dim)

        ts = torch.full((b,), float(timestep))
        temb = self.time_extra_emb.timestep_embedder(
            timestep_embedding(ts, 256))
        pooled = self.time_extra_emb.pooler(t5_ctx)
        s = float(hh * 8)
        meta = torch.tensor([[s, s, s, s, 0.0, 0.0]]).repeat(b, 1)
        size_emb = timestep_embedding(meta.reshape(-1), 256).reshape(b, -1)
        style_emb = self.time_extra_emb.style_embedder(
            torch.zeros(b, dtype=torch.long))
        extra = torch.cat([pooled, size_emb, style_emb], dim=-1)
        e = self.time_extra_emb.extra_embedder.linear_1(extra)
        e = self.time_extra_emb.extra_embedder.linear_2(F.silu(e.float()))
        temb = temb + e

        t5p = self.text_embedder.linear_2(
            F.silu(self.text_embedder.linear_1(t5_ctx).float()))
        ctx = torch.cat([bert_ctx, t5p], dim=1)
        if bert_mask is None:
            bert_mask = torch.ones(b, cfg['text_len'])
        if t5_mask is None:
            t5_mask = torch.ones(b, cfg['text_len_t5'])
        full_mask = torch.cat([bert_mask, t5_mask], dim=1).bool()
        ctx = torch.where(full_mask[..., None], ctx,
                          self.text_embedding_padding[None])

        skips = []
        half = cfg['num_layers'] // 2
        for i, blk in enumerate(self.blocks):
            with_skip = i > half
            x = blk(x, ctx, temb, cos, sin,
                    skip=skips.pop() if with_skip else None,
                    taps=taps, prefix=f'vit-block{i}-')
            if i < half - 1:
                skips.append(x)

        mods = self.norm_out.linear(F.silu(temb))
        scale, shift = torch.chunk(mods, 2, dim=-1)
        h = self.ln(x) * (1 + scale[:, None]) + shift[:, None]
        h = self.proj_out(h)
        h = h.reshape(b, gh, gw, p, p, cfg['out_channels'])
        return torch.einsum('bhwpqc->bchpwq', h).reshape(
            b, cfg['out_channels'], gh * p, gw * p)
