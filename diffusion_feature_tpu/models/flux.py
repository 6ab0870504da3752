"""Flux.1-dev transformer in Flax, tap-instrumented, TPU-native.

Architecture parity with diffusers FluxTransformer2DModel 0.32.2 (the
reference's substrate; overlay at
feature/diffusers/models/transformers/transformer_flux.py).  Tap grammar per
the reference's Flux walk (feature/components/feature_extractor.py:98-123):
dual blocks are ``vit-block{0..18}``, single blocks continue the index
(``vit-block{19..56}``).

Reference tap semantics reproduced exactly:
  dual  block:  'norm-out' = post-norm2 modulated hidden states
                (transformer_flux.py:200-201) and — quirk — 'out' gathers the
                SAME norm_hidden_states, not the residual-added output
                (:210-211)
  single block: 'out' = text-sliced residual output (:107-108)
  attention   : q/k/v are the *image-stream* projections (dual) or
                text-sliced joint projections (single)
                (components/attention.py:429-439); score maps split into
                'cross-map' (image rows x text cols) and 'self-map'
                (image x image) (:494-502); 'attn-out' is the post-projection
                image output (dual, :520-523) / text-sliced raw attention
                output (single, :525-526)

Param naming is chosen so HF checkpoint keys map structurally
(models/convert.py): e.g. torch ``transformer_blocks.0.attn.to_q.weight`` ->
ours ``transformer_blocks_0/attn/to_q/kernel``.
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
from ..ops.quant import Int8Dense
from .layers import AttnStoreCfg, TimestepEmbedding, timestep_embedding


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64                  # 2x2-packed 16-ch latents
    num_layers: int = 19                   # dual-stream (MMDiT) blocks
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096        # T5-XXL width
    pooled_projection_dim: int = 768       # CLIP-L pooled width
    guidance_embeds: bool = True           # .1-dev is guidance-distilled
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    mlp_ratio: float = 4.0
    # int8 weight-only block projections: Flux-dev is 12B params — bf16
    # weights (23.8 GiB) exceed one v5e's 16-GiB HBM, so the single-chip
    # path quantizes them (11.9 GiB) the way the reference fits its 11-GiB
    # GPU budget with bnb-8bit T5 + device_map (components/models.py:150-172).
    # Tensor parallelism (parallel/mesh.py) is the multi-chip alternative.
    # The adaLN modulation projections (norm1_linear/norm1_context_linear/
    # norm_linear, ~3.2B params) are quantized too — keeping them bf16 would
    # add ~6.4 GiB and break the single-chip fit; fidelity at REAL width is
    # measured, not assumed: `tools/golden_fullsize.py flux` runs the int8
    # path at genuine 3072/24-head dims and reports worst tap cosine 1.0000
    # vs the fp32 torch oracle (ADVICE r2 item 4).
    quantize_int8: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def _flux_from_diffusers_config(d: dict) -> 'FluxConfig':
    return FluxConfig(
        in_channels=d.get('in_channels', 64),
        num_layers=d.get('num_layers', 19),
        num_single_layers=d.get('num_single_layers', 38),
        attention_head_dim=d.get('attention_head_dim', 128),
        num_attention_heads=d.get('num_attention_heads', 24),
        joint_attention_dim=d.get('joint_attention_dim', 4096),
        pooled_projection_dim=d.get('pooled_projection_dim', 768),
        guidance_embeds=d.get('guidance_embeds', True),
        axes_dims_rope=tuple(d.get('axes_dims_rope', (16, 56, 56))),
    )


FluxConfig.from_diffusers_config = staticmethod(_flux_from_diffusers_config)


def _dense(cfg: 'FluxConfig', features: int, dtype, name: str,
           use_bias: bool = True):
    """Block-projection factory: int8 weight-only or plain Dense.  Diffusers
    Flux linears all carry biases; the bias stays full precision."""
    if cfg.quantize_int8:
        return Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)

FLUX_DEV = FluxConfig()


def tiny_flux_config() -> FluxConfig:
    return FluxConfig(in_channels=16, num_layers=2, num_single_layers=2,
                      attention_head_dim=8, num_attention_heads=2,
                      joint_attention_dim=32, pooled_projection_dim=32,
                      axes_dims_rope=(2, 2, 4))


# ------------------------------------------------------------------ packing

def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H/2*W/2, C*4): Flux's 2x2 patch packing
    (FluxPipeline._pack_latents numerics)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H/2*W/2, C*4) -> (B, C, H, W)."""
    b, _, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h // 2, w // 2, c, 2, 2)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(b, c, h, w)


def make_img_ids(h: int, w: int) -> np.ndarray:
    """(h/2*w/2, 3) position ids: [:, 1]=row, [:, 2]=col (FluxPipeline
    _prepare_latent_image_ids)."""
    ids = np.zeros((h // 2, w // 2, 3), np.float32)
    ids[..., 1] = np.arange(h // 2, dtype=np.float32)[:, None]
    ids[..., 2] = np.arange(w // 2, dtype=np.float32)[None, :]
    return ids.reshape(-1, 3)


# -------------------------------------------------------------------- RoPE

def rope_cos_sin(ids: np.ndarray, axes_dim: Tuple[int, ...],
                 theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """FluxPosEmbed numerics (repeat-interleave real form, fp64 host math):
    ids (S, n_axes) -> cos/sin (S, head_dim)."""
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.asarray(ids[:, i], np.float64)[:, None] * freqs[None, :]
        coss.append(np.repeat(np.cos(ang), 2, axis=1))
        sins.append(np.repeat(np.sin(ang), 2, axis=1))
    return (np.concatenate(coss, axis=1).astype(np.float32),
            np.concatenate(sins, axis=1).astype(np.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, S, D) with cos/sin (S, D); fp32 rotation, cast back
    (diffusers apply_rotary_emb use_real_unbind_dim=-1)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(xf.shape)
    out = xf * cos[None, None] + rotated * sin[None, None]
    return out.astype(dtype)


class RMSNorm(nn.Module):
    """diffusers RMSNorm (eps inside sqrt, learned scale named to map torch
    ``.weight``)."""
    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param('scale', nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return x * w.astype(x.dtype)


# -------------------------------------------------------------- attention

class FluxJointAttention(nn.Module):
    """Dual-stream joint attention (MMDiT).  Returns (img_out, ctx_out)."""
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                     # 'vit-block{i}'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, img, ctx, cos, sin):
        cfg = self.cfg
        heads, dim_head = cfg.num_attention_heads, cfg.attention_head_dim
        inner = cfg.inner_dim

        q = _dense(cfg, inner, self.dtype, 'to_q')(img)
        k = _dense(cfg, inner, self.dtype, 'to_k')(img)
        v = _dense(cfg, inner, self.dtype, 'to_v')(img)
        # image-stream projections (reference components/attention.py:429-433)
        sow_tap(self, 'q', q)
        sow_tap(self, 'k', k)
        sow_tap(self, 'v', v)

        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))
        qh = RMSNorm(dim_head, dtype=self.dtype, name='norm_q')(qh)
        kh = RMSNorm(dim_head, dtype=self.dtype, name='norm_k')(kh)

        cq = _dense(cfg, inner, self.dtype, 'add_q_proj')(ctx)
        ck = _dense(cfg, inner, self.dtype, 'add_k_proj')(ctx)
        cv = _dense(cfg, inner, self.dtype, 'add_v_proj')(ctx)
        cqh, ckh, cvh = (split_heads(t, heads) for t in (cq, ck, cv))
        cqh = RMSNorm(dim_head, dtype=self.dtype, name='norm_added_q')(cqh)
        ckh = RMSNorm(dim_head, dtype=self.dtype, name='norm_added_k')(ckh)

        text_len = ctx.shape[1]
        # joint sequence = [text; image] (transformer order)
        qj = jnp.concatenate([cqh, qh], axis=2)
        kj = jnp.concatenate([ckh, kh], axis=2)
        vj = jnp.concatenate([cvh, vh], axis=2)
        qj = apply_rope(qj, cos, sin)
        kj = apply_rope(kj, cos, sin)

        img_len = img.shape[1]
        store_this = (self.attn_store is not None and
                      self.attn_store.min_size ** 2 <= img_len
                      <= self.attn_store.max_size ** 2)
        need_probs = (self.taps.wants(child_id(self.tap_name, 'cross-map'))
                      or self.taps.wants(child_id(self.tap_name, 'self-map'))
                      or store_this)
        if need_probs:
            out, probs = attention_with_probs_heads(qj, kj, vj)
            cross = probs[:, :, text_len:, :text_len]
            self_ = probs[:, :, text_len:, text_len:]
            sow_tap(self, 'cross-map', cross)
            sow_tap(self, 'self-map', self_)
            if store_this:
                self.sow('attn_store', f'{self.attn_store.place}_cross',
                         cross.mean(axis=1))
                self.sow('attn_store', f'{self.attn_store.place}_self',
                         self_.mean(axis=1))
        else:
            out = attention_fused_heads(qj, kj, vj)

        out = merge_heads(out)
        ctx_out, img_out = out[:, :text_len], out[:, text_len:]
        img_out = _dense(cfg, inner, self.dtype, 'to_out_0')(img_out)
        sow_tap(self, 'attn-out', img_out)
        ctx_out = _dense(cfg, inner, self.dtype, 'to_add_out')(ctx_out)
        return img_out, ctx_out


class FluxSingleAttention(nn.Module):
    """Single-stream (pre_only) attention over the joint sequence; returns the
    merged-head attention output without projection."""
    cfg: FluxConfig
    text_len: int
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg = self.cfg
        heads, dim_head = cfg.num_attention_heads, cfg.attention_head_dim
        inner = cfg.inner_dim
        tl = self.text_len

        q = _dense(cfg, inner, self.dtype, 'to_q')(x)
        k = _dense(cfg, inner, self.dtype, 'to_k')(x)
        v = _dense(cfg, inner, self.dtype, 'to_v')(x)
        # text-sliced taps (components/attention.py:435-439)
        sow_tap(self, 'q', q[:, tl:])
        sow_tap(self, 'k', k[:, tl:])
        sow_tap(self, 'v', v[:, tl:])

        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))
        qh = RMSNorm(dim_head, dtype=self.dtype, name='norm_q')(qh)
        kh = RMSNorm(dim_head, dtype=self.dtype, name='norm_k')(kh)
        qh = apply_rope(qh, cos, sin)
        kh = apply_rope(kh, cos, sin)

        img_len = x.shape[1] - tl
        store_this = (self.attn_store is not None and
                      self.attn_store.min_size ** 2 <= img_len
                      <= self.attn_store.max_size ** 2)
        need_probs = (self.taps.wants(child_id(self.tap_name, 'cross-map'))
                      or self.taps.wants(child_id(self.tap_name, 'self-map'))
                      or store_this)
        if need_probs:
            out, probs = attention_with_probs_heads(qh, kh, vh)
            cross = probs[:, :, tl:, :tl]
            self_ = probs[:, :, tl:, tl:]
            sow_tap(self, 'cross-map', cross)
            sow_tap(self, 'self-map', self_)
            if store_this:
                self.sow('attn_store', f'{self.attn_store.place}_cross',
                         cross.mean(axis=1))
                self.sow('attn_store', f'{self.attn_store.place}_self',
                         self_.mean(axis=1))
        else:
            out = attention_fused_heads(qh, kh, vh)

        out = merge_heads(out)
        sow_tap(self, 'attn-out', out[:, tl:])
        return out


# ----------------------------------------------------------------- blocks

class FluxTransformerBlock(nn.Module):
    """Dual-stream MMDiT block."""
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''                     # 'vit-block{i}'
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, img, ctx, temb, cos, sin):
        cfg = self.cfg
        dim = cfg.inner_dim
        silu_t = nn.silu(temb)

        mods = _dense(cfg, 6 * dim, self.dtype,
                        'norm1_linear')(silu_t)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, -1)
        cmods = _dense(cfg, 6 * dim, self.dtype,
                         'norm1_context_linear')(silu_t)
        csh_msa, csc_msa, cg_msa, csh_mlp, csc_mlp, cg_mlp = jnp.split(cmods, 6, -1)

        ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=self.dtype)
        norm_img = ln(img) * (1 + sc_msa[:, None]) + sh_msa[:, None]
        norm_ctx = ln(ctx) * (1 + csc_msa[:, None]) + csh_msa[:, None]

        attn = FluxJointAttention(cfg=cfg, dtype=self.dtype, taps=self.taps,
                                  tap_name=self.tap_name,
                                  attn_store=self.attn_store, name='attn')
        attn_out, ctx_attn_out = attn(norm_img, norm_ctx, cos, sin)

        img = img + g_msa[:, None] * attn_out
        norm_h = ln(img) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        sow_tap(self, 'norm-out', norm_h)
        ff = _FluxFeedForward(cfg, dtype=self.dtype, taps=self.taps,
                              tap_name=child_id(self.tap_name, 'ffn'),
                              name='ff')(norm_h)
        img = img + g_mlp[:, None] * ff
        # reference quirk: 'out' gathers norm_hidden_states again, NOT the
        # residual-added output (transformer_flux.py:210-211)
        sow_tap(self, 'out', norm_h)

        ctx = ctx + cg_msa[:, None] * ctx_attn_out
        norm_c = ln(ctx) * (1 + csc_mlp[:, None]) + csh_mlp[:, None]
        ctx = ctx + cg_mlp[:, None] * _FluxFeedForward(
            cfg, dtype=self.dtype, name='ff_context')(norm_c)
        return img, ctx


class _FluxFeedForward(nn.Module):
    """FeedForward(activation_fn='gelu-approximate'); tap 'inner' after the
    activation (overlay models/attention.py:1253-1257)."""
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''

    @nn.compact
    def __call__(self, x):
        inner = int(self.cfg.inner_dim * self.cfg.mlp_ratio)
        h = _dense(self.cfg, inner, self.dtype, 'net_0_proj')(x)
        h = nn.gelu(h, approximate=True)
        sow_tap(self, 'inner', h)
        return _dense(self.cfg, self.cfg.inner_dim, self.dtype, 'net_2')(h)


class FluxSingleTransformerBlock(nn.Module):
    """Single-stream block: parallel attention + MLP, fused output proj."""
    cfg: FluxConfig
    text_len: int
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    tap_name: str = ''
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.cfg
        dim = cfg.inner_dim
        mlp_dim = int(dim * cfg.mlp_ratio)
        residual = x

        mods = _dense(cfg, 3 * dim, self.dtype, 'norm_linear')(
            nn.silu(temb))
        shift, scale, gate = jnp.split(mods, 3, -1)
        norm_x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                              dtype=self.dtype)(x)
        norm_x = norm_x * (1 + scale[:, None]) + shift[:, None]

        mlp = nn.gelu(_dense(cfg, mlp_dim, self.dtype,
                               'proj_mlp')(norm_x), approximate=True)
        attn_out = FluxSingleAttention(
            cfg=cfg, text_len=self.text_len, dtype=self.dtype, taps=self.taps,
            tap_name=self.tap_name, attn_store=self.attn_store,
            name='attn')(norm_x, cos, sin)

        h = jnp.concatenate([attn_out, mlp], axis=-1)
        h = gate[:, None] * _dense(cfg, dim, self.dtype, 'proj_out')(h)
        x = residual + h
        # text-sliced block output (transformer_flux.py:107-108)
        sow_tap(self, 'out', x[:, self.text_len:])
        return x


# ------------------------------------------------------------------- root

class FluxTransformer2D(nn.Module):
    """__call__(packed latents (B, S_img, 64), timestep [0..1000],
    t5_context (B, S_txt, 4096), clip_pooled (B, 768), guidance [0..1000])
    -> packed noise prediction (B, S_img, 64).

    The caller packs/unpacks latents (pack_latents/unpack_latents) and
    supplies the latent grid size for RoPE via ``grid_hw``.

    ``token_pspec`` (e.g. ``('dp', 'sp')``) turns on sequence parallelism:
    (batch, token) sharding constraints are re-asserted at every block
    boundary so XLA's SPMD partitioner keeps activations token-sharded
    across the 'sp' mesh axis and inserts the attention all-gathers over
    ICI itself.  Requires tracing inside the mesh context (the facade's
    ``_jit_sharded`` enters it).
    """
    cfg: FluxConfig
    grid_hw: Tuple[int, int] = (64, 64)    # packed token grid (h/2, w/2)
    text_len: int = 512
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store_sizes: Optional[Tuple[int, int]] = None
    token_pspec: Optional[Tuple[Optional[str], Optional[str]]] = None

    def _constrain(self, x):
        from ..parallel.mesh import constrain_tokens
        return constrain_tokens(x, self.token_pspec)

    @nn.compact
    def __call__(self, hidden_states, timestep, encoder_hidden_states,
                 pooled_projections, guidance=None):
        cfg = self.cfg
        b = hidden_states.shape[0]
        store = (AttnStoreCfg('up', *self.attn_store_sizes)
                 if self.attn_store_sizes is not None else None)

        x = nn.Dense(cfg.inner_dim, dtype=self.dtype,
                     name='x_embedder')(hidden_states.astype(self.dtype))

        ts = jnp.broadcast_to(
            jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = timestep_embedding(ts, 256).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.inner_dim, dtype=self.dtype,
            name='time_text_embed_timestep_embedder')(t_emb)
        if cfg.guidance_embeds:
            g = jnp.broadcast_to(
                jnp.asarray(1000.0 if guidance is None else guidance,
                            jnp.float32).reshape(-1), (b,))
            g_emb = timestep_embedding(g, 256).astype(self.dtype)
            temb = temb + TimestepEmbedding(
                cfg.inner_dim, dtype=self.dtype,
                name='time_text_embed_guidance_embedder')(g_emb)
        # PixArtAlphaTextProjection(act='silu')
        pe = nn.Dense(cfg.inner_dim, dtype=self.dtype,
                      name='time_text_embed_text_embedder_linear_1')(
            pooled_projections.astype(self.dtype))
        pe = nn.Dense(cfg.inner_dim, dtype=self.dtype,
                      name='time_text_embed_text_embedder_linear_2')(nn.silu(pe))
        temb = temb + pe

        ctx = _dense(cfg, cfg.inner_dim, self.dtype, 'context_embedder')(
            encoder_hidden_states.astype(self.dtype))

        # RoPE tables: host-side fp64, static per (grid, text_len)
        gh, gw = self.grid_hw
        ids = np.concatenate(
            [np.zeros((self.text_len, 3), np.float32), make_img_ids(gh * 2, gw * 2)],
            axis=0)
        cos_np, sin_np = rope_cos_sin(ids, cfg.axes_dims_rope)
        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)

        img = self._constrain(x)
        for i in range(cfg.num_layers):
            img, ctx = FluxTransformerBlock(
                cfg=cfg, dtype=self.dtype, taps=self.taps,
                tap_name=f'vit-block{i}', attn_store=store,
                name=f'transformer_blocks_{i}')(img, ctx, temb, cos, sin)
            img = self._constrain(img)

        h = self._constrain(jnp.concatenate([ctx, img], axis=1))
        for j in range(cfg.num_single_layers):
            idx = cfg.num_layers + j
            h = FluxSingleTransformerBlock(
                cfg=cfg, text_len=self.text_len, dtype=self.dtype,
                taps=self.taps, tap_name=f'vit-block{idx}', attn_store=store,
                name=f'single_transformer_blocks_{j}')(h, temb, cos, sin)
            h = self._constrain(h)

        h = h[:, self.text_len:]
        # AdaLayerNormContinuous
        mods = nn.Dense(2 * cfg.inner_dim, dtype=self.dtype,
                        name='norm_out_linear')(nn.silu(temb))
        scale, shift = jnp.split(mods, 2, -1)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype)(h)
        h = h * (1 + scale[:, None]) + shift[:, None]
        return nn.Dense(cfg.in_channels, dtype=self.dtype, name='proj_out')(h)
