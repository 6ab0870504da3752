"""HunyuanDiT transformer in Flax, tap-instrumented, TPU-native.

Architecture parity with diffusers HunyuanDiT2DModel 0.32.2 (the reference
loads Tencent-Hunyuan/HunyuanDiT-Diffusers, feature/components/models.py:134-149).
U-ViT-style long skips in the second half, AdaLayerNormShift blocks, 2D RoPE
(head-dim split across h/w axes), qk layer-norm, dual text conditioning
(BERT 77 tokens + mT5 256 tokens projected to 1024 and concatenated with a
learned padding row for masked positions).

Tap grammar per the reference's DiT walk
(feature/components/feature_extractor.py:250-268): ``vit-block{i}`` with
``-self-{q,k,v,map}``, ``-cross-{q,k,v,map}`` (HunyuanAttnStoreProcessor,
components/attention.py:294-401) and ``-ffn-inner`` (overlay FeedForward,
models/attention.py:1256-1257).  NOTE the block-level ``-out`` tap never
fires in the reference — HunyuanDiTBlock lives outside the overlaid file —
and is reproduced as absent here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec, sow_tap, child_id
from ..ops.attention import (
    attention_fused_heads, attention_with_probs_heads, merge_heads, split_heads,
)
from .layers import AttnStoreCfg, FeedForward, TimestepEmbedding, timestep_embedding
from .flux import rope_cos_sin, apply_rope


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    sample_size: int = 128            # latent side at 1024 px
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8             # learn_sigma
    hidden_size: int = 1408
    num_layers: int = 40
    num_attention_heads: int = 16
    cross_attention_dim: int = 1024   # BERT width / combined text width
    cross_attention_dim_t5: int = 2048
    pooled_projection_dim: int = 1024
    text_len: int = 77
    text_len_t5: int = 256
    mlp_ratio: float = 4.3056640625
    norm_eps: float = 1e-6
    use_style_cond_and_image_meta_size: bool = True
    rope_base_size: int = 32          # 512 // 8 // patch_size (pipeline)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _hunyuan_from_diffusers_config(d: dict) -> 'HunyuanConfig':
    heads = d.get('num_attention_heads', 16)
    return HunyuanConfig(
        sample_size=d.get('sample_size', 128),
        patch_size=d.get('patch_size', 2),
        in_channels=d.get('in_channels', 4),
        out_channels=(d.get('in_channels', 4) * 2
                      if d.get('learn_sigma', True) else d.get('in_channels', 4)),
        hidden_size=d.get('hidden_size',
                          heads * d.get('attention_head_dim', 88)),
        num_layers=d.get('num_layers', 40),
        num_attention_heads=heads,
        cross_attention_dim=d.get('cross_attention_dim', 1024),
        cross_attention_dim_t5=d.get('cross_attention_dim_t5', 2048),
        pooled_projection_dim=d.get('pooled_projection_dim', 1024),
        text_len=d.get('text_len', 77),
        text_len_t5=d.get('text_len_t5', 256),
        mlp_ratio=d.get('mlp_ratio', 4.3056640625),
        use_style_cond_and_image_meta_size=d.get(
            'use_style_cond_and_image_meta_size', True),
    )


HunyuanConfig.from_diffusers_config = staticmethod(_hunyuan_from_diffusers_config)

HUNYUAN_DIT = HunyuanConfig()


def tiny_hunyuan_config() -> HunyuanConfig:
    return HunyuanConfig(sample_size=16, hidden_size=32, num_layers=4,
                         num_attention_heads=2, cross_attention_dim=32,
                         cross_attention_dim_t5=32, pooled_projection_dim=32,
                         text_len=8, text_len_t5=8, mlp_ratio=2.0,
                         rope_base_size=8)


def hunyuan_rope(grid: int, head_dim: int, base_size: int):
    """2D RoPE tables (get_2d_rotary_pos_embed + the pipeline's
    resize-crop-region scaling): square grids map positions onto a
    ``base_size`` frame.

    Axis convention matches diffusers' MAE-lineage meshgrid: the FIRST
    head_dim/2 rotary dims rotate by the COLUMN (w) coordinate
    (grid[0] of ``np.meshgrid(grid_w, grid_h)``), the second half by the
    row.  Tokens flatten row-major."""
    # get_resize_crop_region_for_grid for square input -> ((0,0),(base,base))
    pos = np.linspace(0, base_size, grid, endpoint=False, dtype=np.float64)
    row, col = np.meshgrid(pos, pos, indexing='ij')
    ids = np.stack([col.reshape(-1), row.reshape(-1)], axis=1)  # (S, 2): w, h
    return rope_cos_sin(ids, (head_dim // 2, head_dim // 2))


class HunyuanAttention(nn.Module):
    """Self or cross attention with per-head qk layer-norm and RoPE
    (RoPE on q only for cross-attention, HunyuanAttnProcessor semantics,
    reference components/attention.py:368-371)."""
    cfg: HunyuanConfig
    is_cross: bool = False
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                # '...-self' / '...-cross'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, context=None, cos=None, sin=None):
        cfg = self.cfg
        heads, dim_head = cfg.num_attention_heads, cfg.head_dim
        inner = cfg.hidden_size
        ctx = x if context is None else context

        q = nn.Dense(inner, dtype=self.dtype, name='to_q')(x)
        k = nn.Dense(inner, dtype=self.dtype, name='to_k')(ctx)
        v = nn.Dense(inner, dtype=self.dtype, name='to_v')(ctx)
        sow_tap(self, 'q', q)
        sow_tap(self, 'k', k)
        sow_tap(self, 'v', v)

        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))
        qh = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm_q')(qh)
        kh = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm_k')(kh)
        if cos is not None:
            qh = apply_rope(qh, cos, sin)
            if not self.is_cross:
                kh = apply_rope(kh, cos, sin)

        sq = x.shape[1]
        store_this = (self.attn_store is not None and
                      self.attn_store.min_size ** 2 <= sq
                      <= self.attn_store.max_size ** 2)
        need_probs = self.taps.wants(child_id(self.tap_name, 'map')) or store_this
        if need_probs:
            out, probs = attention_with_probs_heads(qh, kh, vh)
            sow_tap(self, 'map', probs)
            if store_this:
                key = (f"{self.attn_store.place}_"
                       f"{'cross' if self.is_cross else 'self'}")
                self.sow('attn_store', key, probs.mean(axis=1))
        else:
            out = attention_fused_heads(qh, kh, vh)
        return nn.Dense(inner, dtype=self.dtype,
                        name='to_out_0')(merge_heads(out))


class HunyuanDiTBlock(nn.Module):
    cfg: HunyuanConfig
    with_skip: bool = False
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                # 'vit-block{i}'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, context, temb, cos, sin, skip=None):
        cfg = self.cfg
        dim = cfg.hidden_size
        if self.with_skip:
            # diffusers HunyuanDiTBlock: cat([hidden_states, skip]) — the
            # trained skip_linear expects x in the FIRST half
            cat = jnp.concatenate([x, skip], axis=-1)
            cat = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                               name='skip_norm')(cat)
            x = nn.Dense(dim, dtype=self.dtype, name='skip_linear')(cat)

        # AdaLayerNormShift: LN + timestep-conditioned shift (no scale)
        shift = nn.Dense(dim, dtype=self.dtype, name='norm1_linear')(
            nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='norm1_norm')(x) + shift[:, None]
        x = x + HunyuanAttention(
            cfg=cfg, is_cross=False, dtype=self.dtype, taps=self.taps,
            tap_name=child_id(self.tap_name, 'self'),
            attn_store=self.attn_store, name='attn1')(h, None, cos, sin)

        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='norm2')(x)
        x = x + HunyuanAttention(
            cfg=cfg, is_cross=True, dtype=self.dtype, taps=self.taps,
            tap_name=child_id(self.tap_name, 'cross'),
            attn_store=self.attn_store, name='attn2')(h, context, cos, sin)

        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='norm3')(x)
        x = x + FeedForward(dim, inner_dim=int(dim * cfg.mlp_ratio),
                            activation_fn='geglu', dtype=self.dtype,
                            taps=self.taps,
                            tap_name=child_id(self.tap_name, 'ffn'),
                            name='ff')(h)
        # no block-level 'out' tap: see module docstring
        return x


class AttentionPool(nn.Module):
    """CLIP-style attention pooling over the T5 sequence
    (HunyuanDiTAttentionPool)."""
    seq_len: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        pos = self.param('positional_embedding',
                         nn.initializers.normal(c ** -0.5),
                         (self.seq_len + 1, c))
        mean_tok = x.mean(axis=1, keepdims=True)
        x = jnp.concatenate([mean_tok, x], axis=1) + pos[None].astype(x.dtype)
        q = nn.Dense(c, dtype=self.dtype, name='q_proj')(x[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name='k_proj')(x)
        v = nn.Dense(c, dtype=self.dtype, name='v_proj')(x)
        qh, kh, vh = (split_heads(t, self.num_heads) for t in (q, k, v))
        out = attention_fused_heads(qh, kh, vh)
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name='c_proj')(merge_heads(out))
        return out[:, 0]


class HunyuanDiT2D(nn.Module):
    """__call__(latents NCHW, timestep, bert_embeds (B,77,1024), bert_mask,
    t5_embeds (B,256,2048), t5_mask, image_meta_size (B,6), style (B,))
    -> prediction NCHW with 2x channels (learned sigma)."""
    cfg: HunyuanConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store_sizes: Optional[Tuple[int, int]] = None
    # sequence parallelism: (batch, token) axis names, e.g. ('dp', 'sp') —
    # sharding constraints at block boundaries (see models/flux.py)
    token_pspec: Optional[tuple] = None

    def _constrain(self, x):
        from ..parallel.mesh import constrain_tokens
        return constrain_tokens(x, self.token_pspec)

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 text_embedding_mask=None, encoder_hidden_states_t5=None,
                 text_embedding_mask_t5=None, image_meta_size=None,
                 style=None):
        cfg = self.cfg
        b, c, hh, ww = sample.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        dim = cfg.hidden_size
        store = (AttnStoreCfg('up', *self.attn_store_sizes)
                 if self.attn_store_sizes is not None else None)

        # 1. patch embed + 2D RoPE tables
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name='pos_embed_proj')(x)
        x = x.reshape(b, gh * gw, dim)
        cos_np, sin_np = hunyuan_rope(gh, cfg.head_dim, cfg.rope_base_size)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        # 2. combined timestep + pooled-text + size/style conditioning
        ts = jnp.broadcast_to(
            jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        temb = TimestepEmbedding(
            dim, dtype=self.dtype,
            name='time_extra_emb_timestep_embedder')(
            timestep_embedding(ts, 256).astype(self.dtype))
        t5_ctx = encoder_hidden_states_t5.astype(self.dtype)
        pooled = AttentionPool(
            cfg.text_len_t5, cfg.cross_attention_dim_t5, 8,
            cfg.pooled_projection_dim, dtype=self.dtype,
            name='time_extra_emb_pooler')(t5_ctx)
        if cfg.use_style_cond_and_image_meta_size:
            if image_meta_size is None:
                s = float(hh * 8)
                image_meta_size = jnp.tile(
                    jnp.asarray([[s, s, s, s, 0.0, 0.0]], jnp.float32), (b, 1))
            size_emb = timestep_embedding(
                image_meta_size.reshape(-1), 256).reshape(b, 6 * 256)
            style_ids = (jnp.zeros((b,), jnp.int32) if style is None
                         else style.astype(jnp.int32))
            style_emb = nn.Embed(1, dim, dtype=self.dtype,
                                 name='time_extra_emb_style_embedder')(style_ids)
            extra = jnp.concatenate(
                [pooled, size_emb.astype(self.dtype), style_emb], axis=-1)
        else:
            extra = pooled
        # PixArtAlphaTextProjection(act='silu_fp32')
        e = nn.Dense(dim * 4, dtype=self.dtype,
                     name='time_extra_emb_extra_embedder_linear_1')(extra)
        e = nn.silu(e.astype(jnp.float32)).astype(self.dtype)
        e = nn.Dense(dim, dtype=self.dtype,
                     name='time_extra_emb_extra_embedder_linear_2')(e)
        temb = temb + e

        # 3. combined text context: BERT (77) + projected T5 (256), masked
        #    positions replaced by a learned padding row
        bert_ctx = encoder_hidden_states.astype(self.dtype)
        t5p = nn.Dense(cfg.cross_attention_dim_t5 * 4, dtype=self.dtype,
                       name='text_embedder_linear_1')(t5_ctx)
        t5p = nn.silu(t5p.astype(jnp.float32)).astype(self.dtype)
        t5p = nn.Dense(cfg.cross_attention_dim, dtype=self.dtype,
                       name='text_embedder_linear_2')(t5p)
        ctx = jnp.concatenate([bert_ctx, t5p], axis=1)
        padding = self.param(
            'text_embedding_padding', nn.initializers.normal(0.02),
            (cfg.text_len + cfg.text_len_t5, cfg.cross_attention_dim))
        if text_embedding_mask is None:
            text_embedding_mask = jnp.ones((b, cfg.text_len), jnp.int32)
        if text_embedding_mask_t5 is None:
            text_embedding_mask_t5 = jnp.ones((b, cfg.text_len_t5), jnp.int32)
        full_mask = jnp.concatenate(
            [text_embedding_mask, text_embedding_mask_t5], axis=1)
        ctx = jnp.where(full_mask[..., None].astype(bool), ctx,
                        padding[None].astype(ctx.dtype))

        # 4. blocks with U-ViT long skips in the second half
        skips = []
        half = cfg.num_layers // 2
        x = self._constrain(x)
        for i in range(cfg.num_layers):
            with_skip = i > half
            blk = HunyuanDiTBlock(
                cfg=cfg, with_skip=with_skip, dtype=self.dtype,
                taps=self.taps, tap_name=f'vit-block{i}', attn_store=store,
                name=f'blocks_{i}')
            x = blk(x, ctx, temb, cos, sin, skips.pop() if with_skip else None)
            x = self._constrain(x)
            if i < half - 1:
                skips.append(x)

        # 5. AdaLayerNormContinuous out + unpatchify
        mods = nn.Dense(2 * dim, dtype=self.dtype, name='norm_out_linear')(
            nn.silu(temb))
        scale, shift = jnp.split(mods, 2, -1)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        h = h * (1 + scale[:, None]) + shift[:, None]
        h = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype,
                     name='proj_out')(h)
        h = h.reshape(b, gh, gw, p, p, cfg.out_channels)
        h = jnp.einsum('bhwpqc->bchpwq', h).reshape(
            b, cfg.out_channels, gh * p, gw * p)
        return h
