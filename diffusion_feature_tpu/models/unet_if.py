"""DeepFloyd IF stage-I U-Net (pixel space) in Flax, tap-instrumented.

Structural parity with diffusers UNet2DConditionModel as configured by
DeepFloyd/IF-I-L-v1.0 (reference zoo entry feature/components/models.py:119-133):
pixel-space 3->6 channels (learned-range variance), scale-shift timestep
resnets, ResnetDownsample/SimpleCrossAttn block families, added-KV attention
over [text; image] keys, T5-XXL conditioning through ``encoder_hid_proj``.

Exact IF-I-L hyperparameters are only recoverable from the checkpoint's
config.json (zero-egress here); defaults below are best-effort and
``IFUNetConfig.from_diffusers_config`` adapts to a real checkpoint dir.

Tap surface per the reference walk (feature/components/feature_extractor.py:
125-249) — note the IF quirks:
  - resnet taps fire normally: ``{down,up}-level{L}-repeat{R}-res-{increment,out}``
  - IF's downsamplers/upsamplers are themselves resnets, so their taps are
    ``down-level{L}-downsampler-{increment,out}`` (the gatherer prefix is the
    downsampler id, the ResnetBlock2D taps supply the suffix)
  - NO attention taps: the walk assigns a gatherer id
    ``...-vit-block0-cross`` to each Attention module (:158-164), but the
    overlay's AttnAddedKVProcessor contains no gather calls
    (attention_processor.py:1261+), so nothing ever fires — reproduced as
    absent here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec, sow_tap, child_id
from ..ops.attention import attention_fused, split_heads, merge_heads
from .layers import TimestepEmbedding, timestep_embedding


@dataclasses.dataclass(frozen=True)
class IFUNetConfig:
    sample_size: int = 64
    in_channels: int = 3
    out_channels: int = 6                  # learned-range variance
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024)
    down_block_types: Tuple[str, ...] = (
        'ResnetDownsampleBlock2D', 'SimpleCrossAttnDownBlock2D',
        'SimpleCrossAttnDownBlock2D', 'SimpleCrossAttnDownBlock2D')
    up_block_types: Tuple[str, ...] = (
        'SimpleCrossAttnUpBlock2D', 'SimpleCrossAttnUpBlock2D',
        'SimpleCrossAttnUpBlock2D', 'ResnetUpsampleBlock2D')
    layers_per_block: int = 3
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024        # == block_out_channels[-1] for IF
    encoder_hid_dim: int = 4096            # T5-XXL width
    norm_eps: float = 1e-5
    act_fn: str = 'gelu'
    addition_embed_type: Optional[str] = 'text'   # attention-pooled text
    addition_embed_type_num_heads: int = 64

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def from_diffusers_config(d: dict) -> 'IFUNetConfig':
        names = {f.name for f in dataclasses.fields(IFUNetConfig)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in d.items() if k in names}
        return IFUNetConfig(**kw)


IF_I_L = IFUNetConfig()


def tiny_if_config() -> IFUNetConfig:
    return IFUNetConfig(
        sample_size=32, block_out_channels=(32, 64),
        down_block_types=('ResnetDownsampleBlock2D', 'SimpleCrossAttnDownBlock2D'),
        up_block_types=('SimpleCrossAttnUpBlock2D', 'ResnetUpsampleBlock2D'),
        layers_per_block=1, attention_head_dim=16,
        cross_attention_dim=64, encoder_hid_dim=32,
        addition_embed_type_num_heads=4)


def _act(name: str):
    if name == 'gelu':
        return lambda x: nn.gelu(x, approximate=False)   # torch-exact GELU
    return nn.silu


class IFResnetBlock(nn.Module):
    """ResnetBlock2D with time_embedding_norm='scale_shift' and optional
    in-block resampling (IF's resnet up/downsamplers use avg-pool / nearest
    2x, diffusers use_conv=False).  Taps 'increment'/'out'
    (overlay resnet.py:371-377)."""
    in_channels: int
    out_channels: int
    eps: float = 1e-5
    act_fn: str = 'gelu'
    down: bool = False
    up: bool = False
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''

    @nn.compact
    def __call__(self, x, temb):
        act = _act(self.act_fn)
        h = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='norm1')(x)
        h = act(h)
        if self.down:
            pool = lambda a: nn.avg_pool(a, (2, 2), strides=(2, 2))
            h, x = pool(h), pool(x)
        elif self.up:
            def up2(a):
                b, hh, ww, c = a.shape
                return jax.image.resize(a, (b, hh * 2, ww * 2, c), 'nearest')
            h, x = up2(h), up2(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(h)
        t = nn.Dense(self.out_channels * 2, dtype=self.dtype,
                     name='time_emb_proj')(act(temb))
        scale, shift = jnp.split(t[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='norm2')(h)
        h = h * (1 + scale) + shift
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(h)
        sow_tap(self, 'increment', h, layout='nhwc')
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        out = x + h
        sow_tap(self, 'out', out, layout='nhwc')
        return out


class AddedKVAttention(nn.Module):
    """Attention with added key/value projections over the text context
    (AttnAddedKVProcessor math): queries from image tokens, keys/values are
    [projected text; image].  Spatial in/out NHWC with residual."""
    channels: int
    head_dim: int
    cross_attention_dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        heads = c // self.head_dim
        residual = x
        h = x.reshape(b, hh * ww, c)
        h = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='group_norm')(h)
        q = nn.Dense(c, dtype=self.dtype, name='to_q')(h)
        k_self = nn.Dense(c, dtype=self.dtype, name='to_k')(h)
        v_self = nn.Dense(c, dtype=self.dtype, name='to_v')(h)
        k_text = nn.Dense(c, dtype=self.dtype, name='add_k_proj')(context)
        v_text = nn.Dense(c, dtype=self.dtype, name='add_v_proj')(context)
        k = jnp.concatenate([k_text, k_self], axis=1)
        v = jnp.concatenate([v_text, v_self], axis=1)
        out = attention_fused(q, k, v, heads)
        out = nn.Dense(c, dtype=self.dtype, name='to_out_0')(out)
        return out.reshape(b, hh, ww, c) + residual


class IFTextTimeEmbedding(nn.Module):
    """diffusers TextTimeEmbedding (addition_embed_type='text'):
    LN -> AttentionPooling (mean class token + positional embedding, scaled
    q/k per 1/sqrt(sqrt(d))) -> proj -> LN.  Added to the time embedding."""
    embed_dim: int                 # encoder_hid_dim
    time_embed_dim: int
    num_heads: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_embeds):
        # torch nn.LayerNorm default eps is 1e-5 (flax defaults to 1e-6) —
        # the mismatch was the WHOLE 1e-3-tier IF golden noise: it leaks
        # through temb into every scale-shift resnet (root-caused round 5)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(
            text_embeds.astype(self.dtype))
        d = self.embed_dim
        pos = self.param('pool_positional_embedding',
                         nn.initializers.normal(d ** -0.5), (1, d))
        class_token = x.mean(axis=1, keepdims=True) + pos[None].astype(x.dtype)
        xc = jnp.concatenate([class_token, x], axis=1)
        q = nn.Dense(d, dtype=self.dtype, name='pool_q_proj')(class_token)
        k = nn.Dense(d, dtype=self.dtype, name='pool_k_proj')(xc)
        v = nn.Dense(d, dtype=self.dtype, name='pool_v_proj')(xc)
        head_dim = d // self.num_heads
        scale = 1.0 / (head_dim ** 0.25)          # applied to q AND k
        qh = split_heads(q, self.num_heads) * scale
        kh = split_heads(k, self.num_heads) * scale
        vh = split_heads(v, self.num_heads)
        w = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        a = jnp.einsum('bhqk,bhkd->bhqd', w, vh,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        pooled = merge_heads(a)[:, 0]
        out = nn.Dense(self.time_embed_dim, dtype=self.dtype, name='proj')(pooled)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(out)


class IFUNet(nn.Module):
    """__call__(sample NCHW pixels, timestep, encoder_hidden_states (T5),
    added_cond=None, ...) -> (B, out_channels, H, W) prediction
    (epsilon + learned variance halves)."""
    cfg: IFUNetConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store_sizes: Optional[Tuple[int, int]] = None  # unused: IF has no
    # attention taps in the reference (see module docstring)

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_cond=None, encoder_attention_mask=None,
                 down_block_additional_residuals=None,
                 mid_block_additional_residual=None):
        cfg = self.cfg
        sow_tap(self, 'unet-in', sample)
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        bsz = x.shape[0]

        ts = jnp.broadcast_to(
            jnp.asarray(timestep, jnp.float32).reshape(-1), (bsz,))
        t_emb = timestep_embedding(ts, cfg.block_out_channels[0]).astype(self.dtype)
        temb = TimestepEmbedding(cfg.time_embed_dim, act_fn=cfg.act_fn,
                                 dtype=self.dtype, name='time_embedding')(t_emb)
        if cfg.addition_embed_type == 'text':
            temb = temb + IFTextTimeEmbedding(
                embed_dim=cfg.encoder_hid_dim,
                time_embed_dim=cfg.time_embed_dim,
                num_heads=cfg.addition_embed_type_num_heads,
                dtype=self.dtype, name='add_embedding')(
                encoder_hidden_states)

        # T5 width -> cross_attention_dim
        ctx = nn.Dense(cfg.cross_attention_dim, dtype=self.dtype,
                       name='encoder_hid_proj')(
            encoder_hidden_states.astype(self.dtype))

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name='conv_in')(x)
        sow_tap(self, 'unet-after-conv-in', x, layout='nhwc')

        def resnet(prefix, in_ch, out_ch, **kw):
            return IFResnetBlock(
                in_channels=in_ch, out_channels=out_ch, eps=cfg.norm_eps,
                act_fn=cfg.act_fn, dtype=self.dtype, taps=self.taps,
                tap_name=prefix, **kw)

        def attn(name):
            return AddedKVAttention(
                channels=0, head_dim=cfg.attention_head_dim,
                cross_attention_dim=cfg.cross_attention_dim,
                eps=cfg.norm_eps, dtype=self.dtype, name=name)

        # down
        skips = [x]
        ch = cfg.block_out_channels[0]
        for level, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[level]
            has_attn = btype == 'SimpleCrossAttnDownBlock2D'
            is_last = level == len(cfg.down_block_types) - 1
            scope = f'down_blocks_{level}'
            for r in range(cfg.layers_per_block):
                in_ch = ch if r == 0 else out_ch
                prefix = f'down-level{level}-repeat{r}'
                x = resnet(child_id(prefix, 'res'), in_ch, out_ch,
                           name=f'{scope}_resnets_{r}')(x, temb)
                if has_attn:
                    x = attn(f'{scope}_attentions_{r}')(x, ctx)
                skips.append(x)
            ch = out_ch
            if not is_last:
                x = resnet(f'down-level{level}-downsampler', out_ch, out_ch,
                           down=True, name=f'{scope}_downsamplers_0')(x, temb)
                skips.append(x)

        if down_block_additional_residuals is not None:
            skips = [s + r.astype(s.dtype)
                     for s, r in zip(skips, down_block_additional_residuals)]

        # mid: UNetMidBlock2DSimpleCrossAttn = resnet, attn, resnet
        x = resnet('mid-repeat0-res', ch, ch, name='mid_block_resnets_0')(x, temb)
        x = attn('mid_block_attentions_0')(x, ctx)
        x = resnet('mid-repeat1-res', ch, ch, name='mid_block_resnets_1')(x, temb)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)

        # up
        reversed_out = list(reversed(cfg.block_out_channels))
        prev_ch = reversed_out[0]
        for level, btype in enumerate(cfg.up_block_types):
            out_ch = reversed_out[level]
            in_ch = reversed_out[min(level + 1, len(cfg.block_out_channels) - 1)]
            has_attn = btype == 'SimpleCrossAttnUpBlock2D'
            is_last = level == len(cfg.up_block_types) - 1
            scope = f'up_blocks_{level}'
            n = cfg.layers_per_block + 1
            for r in range(n):
                res_skip = in_ch if r == n - 1 else out_ch
                res_in = prev_ch if r == 0 else out_ch
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                prefix = f'up-level{level}-repeat{r}'
                x = resnet(child_id(prefix, 'res'), res_in + res_skip, out_ch,
                           name=f'{scope}_resnets_{r}')(x, temb)
                if has_attn:
                    x = attn(f'{scope}_attentions_{r}')(x, ctx)
            prev_ch = out_ch
            if not is_last:
                x = resnet(f'up-level{level}-upsampler', out_ch, out_ch,
                           up=True, name=f'{scope}_upsamplers_0')(x, temb)

        x = nn.GroupNorm(num_groups=32, epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = _act(cfg.act_fn)(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv_out')(x)
        out = jnp.transpose(x, (0, 3, 1, 2))
        sow_tap(self, 'unet-out', out)
        return out
