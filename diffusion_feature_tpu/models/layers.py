"""Shared Flax building blocks for the diffusion model zoo, with activation
taps compiled into the graph.

Numerics mirror diffusers-0.32.2 module math (the reference's substrate,
SURVEY §2.5) — op order, norm epsilons, activation choices — but the
implementation is TPU-idiomatic: NHWC convs, static TapSpec selection instead
of runtime hooks, fused/flash attention unless score export is requested.

Tap call sites correspond 1:1 to the reference overlay's insertions:
  ResnetBlock2D 'increment'/'out'      <- feature/diffusers/models/resnet.py:371-377
  BasicTransformerBlock 'out'          <- models/attention.py:589-590
  FeedForward 'inner'                  <- models/attention.py:1253-1257
  Attention 'q'/'k'/'v'                <- models/attention_processor.py:1128-1131, 3291-3294
  Attention 'map'                      <- components/attention.py:238-244
  Downsample2D/Upsample2D 'out'        <- models/downsampling.py:149-150, upsampling.py:192-193
  Transformer2DModel 'out'             <- models/transformers/transformer_2d.py:474-475
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec, sow_tap, child_id
from ..ops.attention import attention_with_probs, attention_fused


@dataclasses.dataclass(frozen=True)
class AttnStoreCfg:
    """Facade-level attention-store registration (reference
    components/attention.py:531-603): which U-Net region this attention lives
    in plus the spatial size band to keep, in tokens-per-side."""
    place: str            # 'down' | 'mid' | 'up'
    min_size: int
    max_size: int


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: int = 10000,
                       scale: float = 1.0) -> jnp.ndarray:
    """diffusers get_timestep_embedding numerics (sinusoidal)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None] * scale
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> act -> linear (diffusers TimestepEmbedding; act_fn 'silu'
    default, 'gelu' for DeepFloyd-IF — torch GELU is exact/erf)."""
    embed_dim: int
    act_fn: str = 'silu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        sample = nn.Dense(self.embed_dim, dtype=self.dtype, name='linear_1')(sample)
        if self.act_fn == 'gelu':
            sample = nn.gelu(sample, approximate=False)
        else:
            sample = nn.silu(sample)
        sample = nn.Dense(self.embed_dim, dtype=self.dtype, name='linear_2')(sample)
        return sample


class ResnetBlock2D(nn.Module):
    """GroupNorm/SiLU/conv x2 with timestep injection; taps 'increment' and
    'out'.  Input/output NHWC."""
    in_channels: int
    out_channels: int
    use_temb: bool = True
    eps: float = 1e-5
    groups: int = 32
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name='norm1')(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name='time_emb_proj')(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name='norm2')(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(h)
        sow_tap(self, 'increment', h, layout='nhwc')
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        out = (x + h) / self.output_scale_factor
        sow_tap(self, 'out', out, layout='nhwc')
        return out


class Downsample2D(nn.Module):
    """stride-2 3x3 conv; tap 'out' (reference downsampling.py:149-150)."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv')(x)
        sow_tap(self, 'out', x, layout='nhwc')
        return x


class Upsample2D(nn.Module):
    """2x nearest upsample + 3x3 conv; tap 'out' (upsampling.py:192-193)."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method='nearest')
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv')(x)
        sow_tap(self, 'out', x, layout='nhwc')
        return x


class Attention(nn.Module):
    """Multi-head attention over token sequences with q/k/v/map taps.

    q/k/v taps observe the *pre-head-split* (B, S, inner) projections exactly
    like the reference (attention_processor.py:1128-1131); the 'map' tap is
    the post-softmax per-head score tensor (B, H, Sq, Sk)
    (components/attention.py:238-244).  When neither the map tap nor the
    attention store needs scores, the fused/flash path runs instead.
    """
    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None   # None -> self-attention
    upcast: bool = False
    out_bias: bool = True
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                          # '...-self' or '...-cross'
    attn_store: Optional[AttnStoreCfg] = None
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name='to_q')(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name='to_k')(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name='to_v')(ctx)
        sow_tap(self, 'q', q)
        sow_tap(self, 'k', k)
        sow_tap(self, 'v', v)

        sq = x.shape[1]
        store_this = False
        if self.attn_store is not None:
            # size-band filter on query token count (components/attention.py:113-114)
            store_this = self.attn_store.min_size ** 2 <= sq <= self.attn_store.max_size ** 2
        map_id = child_id(self.tap_name, 'map')
        wants_map = self.taps.wants(map_id)

        if wants_map:
            # a full per-head map was explicitly requested: materialize it
            out, probs = attention_with_probs(
                q, k, v, self.heads, mask=mask, upcast=self.upcast)
            sow_tap(self, 'map', probs)
            if store_this:
                key = f"{self.attn_store.place}_{'cross' if self.is_cross else 'self'}"
                self.sow('attn_store', key, probs.mean(axis=1))
        elif store_this and mask is None:
            # store-only: head-mean via the Pallas streaming kernel — the
            # per-head (B,H,Sq,Sk) tensor never exists
            from ..ops.attention import (
                attention_with_headmean_heads, merge_heads, split_heads,
            )
            qh, kh, vh = (split_heads(t, self.heads) for t in (q, k, v))
            if self.upcast:
                qh, kh = qh.astype(jnp.float32), kh.astype(jnp.float32)
                vh = vh.astype(jnp.float32)
            out_h, mean_p = attention_with_headmean_heads(qh, kh, vh)
            out = merge_heads(out_h).astype(q.dtype)
            key = f"{self.attn_store.place}_{'cross' if self.is_cross else 'self'}"
            self.sow('attn_store', key, mean_p.astype(q.dtype))
        elif store_this:
            out, probs = attention_with_probs(
                q, k, v, self.heads, mask=mask, upcast=self.upcast)
            key = f"{self.attn_store.place}_{'cross' if self.is_cross else 'self'}"
            self.sow('attn_store', key, probs.mean(axis=1))
        else:
            out = attention_fused(q, k, v, self.heads, mask=mask, upcast=self.upcast)

        out = nn.Dense(self.query_dim, use_bias=self.out_bias, dtype=self.dtype,
                       name='to_out_0')(out)
        return out


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name='proj')(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class GELUProj(nn.Module):
    """diffusers GELU activation block (proj + gelu) — used with
    activation_fn='gelu-approximate' in DiT family."""
    inner_dim: int
    approximate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name='proj')(x)
        return nn.gelu(h, approximate=self.approximate)


class FeedForward(nn.Module):
    """GEGLU MLP; tap 'inner' fires on the gated activation
    (models/attention.py:1253-1257 taps after net[0])."""
    dim: int
    mult: int = 4
    activation_fn: str = 'geglu'
    inner_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                          # '...-ffn'

    @nn.compact
    def __call__(self, x):
        inner = self.inner_dim if self.inner_dim else self.dim * self.mult
        if self.activation_fn == 'geglu':
            h = GEGLU(inner, dtype=self.dtype, name='net_0')(x)
        elif self.activation_fn == 'gelu-approximate':
            h = GELUProj(inner, approximate=True, dtype=self.dtype, name='net_0')(x)
        else:
            h = GELUProj(inner, approximate=False, dtype=self.dtype, name='net_0')(x)
        sow_tap(self, 'inner', h)
        h = nn.Dense(self.dim, dtype=self.dtype, name='net_2')(h)
        return h


class BasicTransformerBlock(nn.Module):
    """LN->self-attn->LN->cross-attn->LN->FF with residuals; tap 'out' at
    block end (models/attention.py:589-590)."""
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                          # '...-vit-block{i}'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        attn1 = Attention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            cross_attention_dim=self.cross_attention_dim if self.only_cross_attention else None,
            upcast=self.upcast_attention, dtype=self.dtype, taps=self.taps,
            tap_name=child_id(self.tap_name, 'self'),
            attn_store=self.attn_store, is_cross=self.only_cross_attention,
            name='attn1')
        x = x + attn1(h, context if self.only_cross_attention else None)

        if self.cross_attention_dim is not None and not self.only_cross_attention:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
            attn2 = Attention(
                query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                upcast=self.upcast_attention, dtype=self.dtype, taps=self.taps,
                tap_name=child_id(self.tap_name, 'cross'),
                attn_store=self.attn_store, is_cross=True,
                name='attn2')
            x = x + attn2(h, context, mask)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm3')(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, taps=self.taps,
                            tap_name=child_id(self.tap_name, 'ffn'),
                            name='ff')(h)
        sow_tap(self, 'out', x)
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer wrapper; tap 'out' fires on the post-residual NHWC
    output (transformer_2d.py:474-475).  Input/output NHWC."""
    in_channels: int
    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: Optional[int] = None
    use_linear_projection: bool = False
    upcast_attention: bool = False
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                          # '...-vit'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        b, hgt, wid, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=self.norm_eps, dtype=self.dtype,
                         name='norm')(x)
        if self.use_linear_projection:
            h = h.reshape(b, hgt * wid, c)
            h = nn.Dense(inner, dtype=self.dtype, name='proj_in')(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name='proj_in')(h)
            h = h.reshape(b, hgt * wid, inner)

        for i in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention, dtype=self.dtype,
                taps=self.taps,
                tap_name=child_id(self.tap_name, f'block{i}'),
                attn_store=self.attn_store,
                name=f'transformer_blocks_{i}')(h, context, mask)

        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name='proj_out')(h)
            h = h.reshape(b, hgt, wid, c)
        else:
            h = h.reshape(b, hgt, wid, inner)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_out')(h)
        out = h + residual
        sow_tap(self, 'out', out, layout='nhwc')
        return out
