"""PixArt-α / PixArt-Σ transformer (DiT) in Flax, tap-instrumented.

Architecture parity with diffusers Transformer2DModel's patch-input +
ada_norm_single branch (the reference's PixArt substrate; tap walk at
feature/components/feature_extractor.py:250-287 gives blocks the ids
``vit-block{i}`` with -self/-cross/-ffn children, and the transformer output
tap ``vit-out`` fires in transformer_2d.py:474-475).

Key pieces: patch embed with fixed 2-D sincos positions (interpolation-scaled),
AdaLayerNormSingle (one 6*dim modulation shared across blocks, each block adds
its own learned scale_shift_table), caption projection from T5 width, learned
sigma output (out_channels = 2*latent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec, sow_tap, child_id
from .layers import (
    Attention, AttnStoreCfg, FeedForward, TimestepEmbedding,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    sample_size: int = 64              # latent side (img/8)
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8              # learned sigma
    num_layers: int = 28
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    cross_attention_dim: int = 1152
    caption_channels: int = 4096
    norm_eps: float = 1e-6
    interpolation_scale: int = 1

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim


def _pixart_from_diffusers_config(d: dict) -> 'PixArtConfig':
    return PixArtConfig(
        sample_size=d.get('sample_size', 64),
        patch_size=d.get('patch_size', 2),
        in_channels=d.get('in_channels', 4),
        out_channels=d.get('out_channels', 8),
        num_layers=d.get('num_layers', 28),
        num_attention_heads=d.get('num_attention_heads', 16),
        attention_head_dim=d.get('attention_head_dim', 72),
        cross_attention_dim=d.get('cross_attention_dim') or 1152,
        caption_channels=d.get('caption_channels', 4096),
        interpolation_scale=d.get('interpolation_scale', 1) or 1,
        norm_eps=d.get('norm_eps', 1e-6),
    )


PixArtConfig.from_diffusers_config = staticmethod(_pixart_from_diffusers_config)

PIXART_ALPHA_512 = PixArtConfig(sample_size=64, interpolation_scale=1)
PIXART_SIGMA_512 = PixArtConfig(sample_size=64, interpolation_scale=1)
PIXART_SIGMA_1024 = PixArtConfig(sample_size=128, interpolation_scale=2)


def tiny_pixart_config() -> PixArtConfig:
    return PixArtConfig(sample_size=8, num_layers=2, num_attention_heads=2,
                        attention_head_dim=8, cross_attention_dim=16,
                        caption_channels=32)


def sincos_2d_pos_embed(dim: int, grid: int, base_size: int,
                        interpolation_scale: float) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed numerics.

    MAE-lineage axis convention: ``np.meshgrid(grid_w, grid_h)`` puts the
    COLUMN (w) coordinate in grid[0], so the first half of the embedding dim
    encodes w and the second half h.  Tokens flatten row-major (r*W + c).
    """
    g = np.arange(grid, dtype=np.float64) / (grid / base_size) / interpolation_scale
    col, row = np.meshgrid(g, g)        # 'xy': col[i,j]=g[j], row[i,j]=g[i]

    def embed_1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum('m,d->md', pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_w = embed_1d(dim // 2, col)     # first half <- w (grid[0])
    emb_h = embed_1d(dim // 2, row)
    return np.concatenate([emb_w, emb_h], axis=1)  # (grid², dim)


class PixArtBlock(nn.Module):
    """BasicTransformerBlock with norm_type='ada_norm_single'."""
    cfg: PixArtConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                  # 'vit-block{i}'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, context, t6, encoder_mask=None):
        cfg = self.cfg
        dim = cfg.inner_dim
        b = x.shape[0]
        table = self.param('scale_shift_table',
                           nn.initializers.normal(dim ** -0.5), (6, dim))
        mods = table[None] + t6.reshape(b, 6, dim).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(self.dtype) for m in jnp.split(mods, 6, axis=1)]

        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name='norm1')(x)
        h = h * (1 + scale_msa) + shift_msa
        attn1 = Attention(
            query_dim=dim, heads=cfg.num_attention_heads,
            dim_head=cfg.attention_head_dim, qkv_bias=True, dtype=self.dtype,
            taps=self.taps, tap_name=child_id(self.tap_name, 'self'),
            attn_store=self.attn_store, name='attn1')
        x = x + gate_msa * attn1(h)

        # PixArt applies no norm before cross-attention (ada_norm_single)
        attn2 = Attention(
            query_dim=dim, heads=cfg.num_attention_heads,
            dim_head=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim, qkv_bias=True,
            dtype=self.dtype, taps=self.taps,
            tap_name=child_id(self.tap_name, 'cross'),
            attn_store=self.attn_store, is_cross=True, name='attn2')
        x = x + attn2(x, context, encoder_mask)

        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name='norm2')(x)
        h = h * (1 + scale_mlp) + shift_mlp
        ff = FeedForward(dim, activation_fn='gelu-approximate',
                         dtype=self.dtype, taps=self.taps,
                         tap_name=child_id(self.tap_name, 'ffn'), name='ff')
        x = x + gate_mlp * ff(h)
        sow_tap(self, 'out', x)
        return x


class PixArtTransformer2D(nn.Module):
    """__call__(latents NCHW, timestep, encoder_hidden_states,
    encoder_attention_mask) -> noise prediction NCHW (sigma half dropped by
    the scheduler step, as in diffusers)."""
    cfg: PixArtConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store_sizes: Optional[tuple] = None
    # sequence parallelism: (batch, token) axis names, e.g. ('dp', 'sp') —
    # sharding constraints at block boundaries (see models/flux.py)
    token_pspec: Optional[tuple] = None

    def _constrain(self, x):
        from ..parallel.mesh import constrain_tokens
        return constrain_tokens(x, self.token_pspec)

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 encoder_attention_mask=None):
        cfg = self.cfg
        b, c, hh, ww = sample.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        dim = cfg.inner_dim

        store = None
        if self.attn_store_sizes is not None:
            store = AttnStoreCfg('up', *self.attn_store_sizes)

        # 1. patchify + position embed
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name='pos_embed_proj')(x)
        x = x.reshape(b, gh * gw, dim)
        pos = sincos_2d_pos_embed(dim, gh, cfg.sample_size // p,
                                  cfg.interpolation_scale)
        x = x + jnp.asarray(pos, self.dtype)[None]

        # 2. AdaLayerNormSingle: shared 6*dim modulation (module names map
        # the torch keys adaln_single.emb.timestep_embedder.* / .linear.*)
        t_proj = timestep_embedding(
            jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,)),
            256).astype(self.dtype)
        emb = TimestepEmbedding(
            dim, dtype=self.dtype,
            name='adaln_single_emb_timestep_embedder')(t_proj)
        t6 = nn.Dense(6 * dim, dtype=self.dtype, name='adaln_single_linear')(
            nn.silu(emb))

        # 3. caption projection (T5 -> dim)
        ctx = encoder_hidden_states.astype(self.dtype)
        ctx = nn.Dense(dim, dtype=self.dtype, name='caption_projection_linear_1')(ctx)
        ctx = nn.gelu(ctx, approximate=True)
        ctx = nn.Dense(dim, dtype=self.dtype, name='caption_projection_linear_2')(ctx)

        mask = None
        if encoder_attention_mask is not None:
            mask = (1.0 - encoder_attention_mask[:, None, None, :]
                    .astype(jnp.float32)) * -10000.0
            mask = mask.astype(self.dtype)

        # 4. blocks
        x = self._constrain(x)
        for i in range(cfg.num_layers):
            x = PixArtBlock(cfg=cfg, dtype=self.dtype, taps=self.taps,
                            tap_name=f'vit-block{i}', attn_store=store,
                            name=f'transformer_blocks_{i}')(x, ctx, t6, mask)
            x = self._constrain(x)

        # 5. output: modulated norm + linear + unpatchify
        table = self.param('scale_shift_table',
                           nn.initializers.normal(dim ** -0.5), (2, dim))
        mods = table[None] + emb[:, None].astype(jnp.float32)
        shift, scale = [m.astype(self.dtype) for m in jnp.split(mods, 2, axis=1)]
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name='norm_out')(x)
        h = h * (1 + scale) + shift
        h = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype,
                     name='proj_out')(h)

        h = h.reshape(b, gh, gw, p, p, cfg.out_channels)
        h = jnp.einsum('bhwpqc->bchpwq', h).reshape(
            b, cfg.out_channels, gh * p, gw * p)
        # no root 'vit-out' tap: the reference's DiT walk assigns gatherers
        # only to blocks (feature_extractor.py:250-287), so the
        # Transformer2DModel-level tap never fires for PixArt.
        return h
