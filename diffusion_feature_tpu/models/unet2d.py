"""UNet2DConditionModel in Flax, tap-instrumented, NHWC/TPU-native.

Covers the SD-1.5 / SD-2.1 / SDXL / Playground-v2 architectures (reference
model zoo, feature/components/models.py:18-70).  Tap grammar matches
prepare_feature_extractor's U-Net walk (feature/components/
feature_extractor.py:125-249): down-level{L}-repeat{R}-..., mid-...,
up-level{L}-..., plus root taps unet-in / unet-after-conv-in / unet-out
(overlay unet_2d_condition.py:1169-1173, :1309-1310).

External interface is NCHW latents (reference layout); convs run NHWC
internally for TPU efficiency.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec, sow_tap, child_id
from .layers import (
    AttnStoreCfg,
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        'CrossAttnDownBlock2D', 'CrossAttnDownBlock2D',
        'CrossAttnDownBlock2D', 'DownBlock2D')
    up_block_types: Tuple[str, ...] = (
        'UpBlock2D', 'CrossAttnUpBlock2D',
        'CrossAttnUpBlock2D', 'CrossAttnUpBlock2D')
    layers_per_block: int = 2
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    upcast_attention: bool = False
    addition_embed_type: Optional[str] = None       # 'text_time' for SDXL
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_eps: float = 1e-5
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def from_diffusers_config(d: dict) -> 'UNetConfig':
        """Adapt a diffusers unet/config.json so local checkpoints configure
        the architecture exactly (fine-tunes may deviate from the presets)."""
        n_blocks = len(d.get('block_out_channels', SD15_UNET.block_out_channels))

        def per_block(v, default):
            if v is None:
                v = default
            return tuple(v) if isinstance(v, (list, tuple)) else (v,) * n_blocks

        heads = d.get('num_attention_heads') or d.get('attention_head_dim', 8)
        return UNetConfig(
            in_channels=d.get('in_channels', 4),
            out_channels=d.get('out_channels', 4),
            block_out_channels=tuple(d.get('block_out_channels',
                                           SD15_UNET.block_out_channels)),
            down_block_types=tuple(d.get('down_block_types',
                                         SD15_UNET.down_block_types)),
            up_block_types=tuple(d.get('up_block_types',
                                       SD15_UNET.up_block_types)),
            layers_per_block=d.get('layers_per_block', 2),
            num_attention_heads=per_block(heads, 8),
            transformer_layers_per_block=per_block(
                d.get('transformer_layers_per_block'), 1),
            cross_attention_dim=d.get('cross_attention_dim', 768),
            use_linear_projection=d.get('use_linear_projection', False),
            upcast_attention=d.get('upcast_attention', False),
            addition_embed_type=d.get('addition_embed_type'),
            addition_time_embed_dim=d.get('addition_time_embed_dim', 256),
            projection_class_embeddings_input_dim=d.get(
                'projection_class_embeddings_input_dim', 2816),
            norm_eps=d.get('norm_eps', 1e-5),
            freq_shift=d.get('freq_shift', 0.0),
            flip_sin_to_cos=d.get('flip_sin_to_cos', True),
        )


SD15_UNET = UNetConfig()
SD21_UNET = UNetConfig(
    num_attention_heads=(5, 10, 20, 20),
    cross_attention_dim=1024,
    use_linear_projection=True,
    upcast_attention=True,
)
SDXL_UNET = UNetConfig(
    block_out_channels=(320, 640, 1280),
    down_block_types=('DownBlock2D', 'CrossAttnDownBlock2D', 'CrossAttnDownBlock2D'),
    up_block_types=('CrossAttnUpBlock2D', 'CrossAttnUpBlock2D', 'UpBlock2D'),
    num_attention_heads=(5, 10, 20),
    transformer_layers_per_block=(1, 2, 10),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type='text_time',
)


def tiny_unet_config(cross_dim: int = 32, with_xl_embeds: bool = False) -> UNetConfig:
    """Small config for offline tests: same topology family as SD-1.5/XL."""
    return UNetConfig(
        block_out_channels=(32, 64),
        down_block_types=('CrossAttnDownBlock2D', 'DownBlock2D'),
        up_block_types=('UpBlock2D', 'CrossAttnUpBlock2D'),
        layers_per_block=1,
        num_attention_heads=(2, 2),
        transformer_layers_per_block=(1, 1),
        cross_attention_dim=cross_dim,
        addition_embed_type='text_time' if with_xl_embeds else None,
        projection_class_embeddings_input_dim=32 * 4 + 6 * 32,
        addition_time_embed_dim=32,
    )


class CrossAttnDownBlock2D(nn.Module):
    cfg: UNetConfig
    level: int
    in_channels: int
    out_channels: int
    add_downsample: bool
    has_attn: bool
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, temb, context, mask=None):
        cfg = self.cfg
        outputs = []
        for r in range(cfg.layers_per_block):
            in_ch = self.in_channels if r == 0 else self.out_channels
            prefix = f'down-level{self.level}-repeat{r}'
            x = ResnetBlock2D(
                in_channels=in_ch, out_channels=self.out_channels,
                eps=cfg.norm_eps, dtype=self.dtype, taps=self.taps,
                tap_name=child_id(prefix, 'res'),
                name=f'resnets_{r}')(x, temb)
            if self.has_attn:
                heads = cfg.num_attention_heads[self.level]
                x = Transformer2DModel(
                    in_channels=self.out_channels, heads=heads,
                    dim_head=self.out_channels // heads,
                    depth=cfg.transformer_layers_per_block[self.level],
                    cross_attention_dim=cfg.cross_attention_dim,
                    use_linear_projection=cfg.use_linear_projection,
                    upcast_attention=cfg.upcast_attention, dtype=self.dtype,
                    taps=self.taps, tap_name=child_id(prefix, 'vit'),
                    attn_store=self.attn_store,
                    name=f'attentions_{r}')(x, context, mask)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, taps=self.taps,
                             tap_name=f'down-level{self.level}-downsampler',
                             name='downsamplers_0')(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, temb, context, mask=None):
        cfg = self.cfg
        x = ResnetBlock2D(
            in_channels=self.channels, out_channels=self.channels,
            eps=cfg.norm_eps, dtype=self.dtype, taps=self.taps,
            tap_name='mid-repeat0-res', name='resnets_0')(x, temb)
        heads = cfg.num_attention_heads[-1]
        x = Transformer2DModel(
            in_channels=self.channels, heads=heads,
            dim_head=self.channels // heads,
            depth=cfg.transformer_layers_per_block[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            upcast_attention=cfg.upcast_attention, dtype=self.dtype,
            taps=self.taps, tap_name='mid-vit', attn_store=self.attn_store,
            name='attentions_0')(x, context, mask)
        x = ResnetBlock2D(
            in_channels=self.channels, out_channels=self.channels,
            eps=cfg.norm_eps, dtype=self.dtype, taps=self.taps,
            tap_name='mid-repeat1-res', name='resnets_1')(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    cfg: UNetConfig
    level: int
    in_channels: int          # skip channels from the mirrored down level
    prev_output_channel: int
    out_channels: int
    add_upsample: bool
    has_attn: bool
    heads: int = 8
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store: Optional[AttnStoreCfg] = None

    @nn.compact
    def __call__(self, x, skips, temb, context, mask=None):
        cfg = self.cfg
        num_layers = cfg.layers_per_block + 1
        for r in range(num_layers):
            res_skip = self.in_channels if r == num_layers - 1 else self.out_channels
            res_in = self.prev_output_channel if r == 0 else self.out_channels
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            prefix = f'up-level{self.level}-repeat{r}'
            x = ResnetBlock2D(
                in_channels=res_in + res_skip, out_channels=self.out_channels,
                eps=cfg.norm_eps, dtype=self.dtype, taps=self.taps,
                tap_name=child_id(prefix, 'res'),
                name=f'resnets_{r}')(x, temb)
            if self.has_attn:
                x = Transformer2DModel(
                    in_channels=self.out_channels, heads=self.heads,
                    dim_head=self.out_channels // self.heads,
                    depth=self.depth,
                    cross_attention_dim=cfg.cross_attention_dim,
                    use_linear_projection=cfg.use_linear_projection,
                    upcast_attention=cfg.upcast_attention, dtype=self.dtype,
                    taps=self.taps, tap_name=child_id(prefix, 'vit'),
                    attn_store=self.attn_store,
                    name=f'attentions_{r}')(x, context, mask)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, taps=self.taps,
                           tap_name=f'up-level{self.level}-upsampler',
                           name='upsamplers_0')(x)
        return x


class UNet2DConditionModel(nn.Module):
    """Root module.  __call__(sample NCHW, timestep, encoder_hidden_states,
    added_cond=None, down_block_additional_residuals=None,
    mid_block_additional_residual=None) -> noise prediction NCHW."""
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32
    taps: TapSpec = EMPTY
    attn_store_sizes: Optional[Tuple[int, int]] = None   # (min, max) per facade

    def _store(self, place: str) -> Optional[AttnStoreCfg]:
        if self.attn_store_sizes is None:
            return None
        lo, hi = self.attn_store_sizes
        return AttnStoreCfg(place, lo, hi)

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_cond=None, encoder_attention_mask=None,
                 down_block_additional_residuals=None,
                 mid_block_additional_residual=None):
        cfg = self.cfg
        # root taps fire in the reference's NCHW layout (overlay
        # unet_2d_condition.py:1169-1173)
        sow_tap(self, 'unet-in', sample)
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)  # -> NHWC

        # 1. time embedding
        bsz = x.shape[0]
        timesteps = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (bsz,))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name='time_embedding')(t_emb)

        if cfg.addition_embed_type == 'text_time':
            # SDXL micro-conditioning (reference diffusion_feature.py:324-354)
            text_embeds = added_cond['text_embeds']
            time_ids = added_cond['time_ids']
            time_embeds = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift)
            time_embeds = time_embeds.reshape(bsz, -1).astype(self.dtype)
            add_embeds = jnp.concatenate(
                [text_embeds.astype(self.dtype), time_embeds], axis=-1)
            aug_emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                        name='add_embedding')(add_embeds)
            emb = emb + aug_emb

        context = encoder_hidden_states.astype(self.dtype)
        if encoder_attention_mask is not None:
            # diffusers converts the 0/1 keep-mask to an additive bias at
            # UNet entry: (1 - m) * -10000
            encoder_attention_mask = (
                (1.0 - encoder_attention_mask.astype(jnp.float32))
                * -10000.0)[:, None, None, :].astype(self.dtype)

        # 2. conv_in
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name='conv_in')(x)
        sow_tap(self, 'unet-after-conv-in', x, layout='nhwc')

        # 3. down
        skips = [x]
        ch = cfg.block_out_channels[0]
        for level, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[level]
            is_last = level == len(cfg.down_block_types) - 1
            block = CrossAttnDownBlock2D(
                cfg=cfg, level=level, in_channels=ch, out_channels=out_ch,
                add_downsample=not is_last,
                has_attn=btype == 'CrossAttnDownBlock2D',
                dtype=self.dtype, taps=self.taps,
                attn_store=self._store('down'),
                name=f'down_blocks_{level}')
            x, outs = block(x, emb, context, encoder_attention_mask)
            skips.extend(outs)
            ch = out_ch

        # diffusers only augments the skip list; the mid-block input is NOT
        # replaced (overlay unet_2d_condition.py:1236-1245)
        if down_block_additional_residuals is not None:
            skips = [s + r.astype(s.dtype)
                     for s, r in zip(skips, down_block_additional_residuals)]

        # 4. mid
        x = UNetMidBlock2DCrossAttn(
            cfg=cfg, channels=cfg.block_out_channels[-1], dtype=self.dtype,
            taps=self.taps, attn_store=self._store('mid'),
            name='mid_block')(x, emb, context, encoder_attention_mask)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)

        # 5. up
        reversed_out = list(reversed(cfg.block_out_channels))
        reversed_heads = list(reversed(cfg.num_attention_heads))
        reversed_depth = list(reversed(cfg.transformer_layers_per_block))
        prev_ch = reversed_out[0]
        for level, btype in enumerate(cfg.up_block_types):
            out_ch = reversed_out[level]
            in_ch = reversed_out[min(level + 1, len(cfg.block_out_channels) - 1)]
            is_last = level == len(cfg.up_block_types) - 1
            n = cfg.layers_per_block + 1
            block_skips = skips[-n:]
            skips = skips[:-n]
            block = CrossAttnUpBlock2D(
                cfg=cfg, level=level, in_channels=in_ch,
                prev_output_channel=prev_ch, out_channels=out_ch,
                add_upsample=not is_last,
                has_attn=btype == 'CrossAttnUpBlock2D',
                heads=reversed_heads[level], depth=reversed_depth[level],
                dtype=self.dtype, taps=self.taps,
                attn_store=self._store('up'),
                name=f'up_blocks_{level}')
            x = block(x, block_skips, emb, context, encoder_attention_mask)
            prev_ch = out_ch

        # 6. out
        x = nn.GroupNorm(num_groups=32, epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv_out')(x)
        out = jnp.transpose(x, (0, 3, 1, 2))  # -> NCHW
        sow_tap(self, 'unet-out', out)
        return out
