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

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
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


def state_dict_numpy(module: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
