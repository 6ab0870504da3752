"""AutoencoderKL in Flax (NHWC) — the latent codec for SD/PixArt/Flux.

Mirrors diffusers AutoencoderKL math: encoder (down blocks + mid w/ single
attention), moments -> DiagonalGaussian, decoder.  The reference uses the
pipelines' ``prepare_latents`` which samples the posterior and multiplies by
``scaling_factor`` (reference call stack SURVEY §3.2; vae-out pseudo-layer at
feature/diffusion_feature.py:477-485).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention_fused
from ..utils import normal_like


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0           # Flux: 0.1159
    # SD/SDXL AutoencoderKL applies 1x1 quant/post-quant convs around the
    # latent bottleneck (diffusers default use_quant_conv=True); Flux's VAE
    # config disables both.
    use_quant_conv: bool = True


def _vae_from_diffusers_config(d: dict) -> 'VAEConfig':
    return VAEConfig(
        in_channels=d.get('in_channels', 3),
        out_channels=d.get('out_channels', 3),
        latent_channels=d.get('latent_channels', 4),
        block_out_channels=tuple(d.get('block_out_channels',
                                       (128, 256, 512, 512))),
        layers_per_block=d.get('layers_per_block', 2),
        scaling_factor=d.get('scaling_factor', 0.18215),
        shift_factor=d.get('shift_factor') or 0.0,
        use_quant_conv=d.get('use_quant_conv', True),
    )


VAEConfig.from_diffusers_config = staticmethod(_vae_from_diffusers_config)

SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
FLUX_VAE = VAEConfig(latent_channels=16, scaling_factor=0.3611,
                     shift_factor=0.1159, use_quant_conv=False)


def tiny_vae_config(latent_channels: int = 4) -> VAEConfig:
    return VAEConfig(block_out_channels=(32, 32), layers_per_block=1,
                     latent_channels=latent_channels)


class VAEResnetBlock(nn.Module):
    in_channels: int
    out_channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='norm1')(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(h)
        h = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='norm2')(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial attention in the VAE mid block."""
    channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                         name='group_norm')(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name='to_q')(y)
        k = nn.Dense(c, dtype=self.dtype, name='to_k')(y)
        v = nn.Dense(c, dtype=self.dtype, name='to_v')(y)
        out = attention_fused(q, k, v, heads=1)
        out = nn.Dense(c, dtype=self.dtype, name='to_out_0')(out)
        return out.reshape(b, h, w, c) + res


class VAEMidBlock(nn.Module):
    channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, self.channels, self.eps,
                           dtype=self.dtype, name='resnets_0')(x)
        x = VAEAttention(self.channels, self.eps, dtype=self.dtype,
                         name='attentions_0')(x)
        x = VAEResnetBlock(self.channels, self.channels, self.eps,
                           dtype=self.dtype, name='resnets_1')(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name='conv_in')(x)
        ch = cfg.block_out_channels[0]
        for level, out_ch in enumerate(cfg.block_out_channels):
            for r in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch if r == 0 else out_ch, out_ch,
                                   cfg.norm_eps, dtype=self.dtype,
                                   name=f'down_blocks_{level}_resnets_{r}')(x)
            ch = out_ch
            if level != len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: asymmetric pad (0,1) then stride-2
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding='VALID',
                            dtype=self.dtype,
                            name=f'down_blocks_{level}_downsamplers_0_conv')(x)
        x = VAEMidBlock(ch, cfg.norm_eps, dtype=self.dtype, name='mid_block')(x)
        x = nn.GroupNorm(num_groups=32, epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.latent_channels * 2, (3, 3), padding=1,
                    dtype=self.dtype, name='conv_out')(x)
        return x  # moments (mean, logvar) stacked on channels


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        reversed_ch = list(reversed(cfg.block_out_channels))
        x = nn.Conv(reversed_ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(z)
        x = VAEMidBlock(reversed_ch[0], cfg.norm_eps, dtype=self.dtype,
                        name='mid_block')(x)
        ch = reversed_ch[0]
        for level, out_ch in enumerate(reversed_ch):
            for r in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch if r == 0 else out_ch, out_ch,
                                   cfg.norm_eps, dtype=self.dtype,
                                   name=f'up_blocks_{level}_resnets_{r}')(x)
            ch = out_ch
            if level != len(reversed_ch) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method='nearest')
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f'up_blocks_{level}_upsamplers_0_conv')(x)
        x = nn.GroupNorm(num_groups=32, epsilon=cfg.norm_eps, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv_out')(x)
        return x


class AutoencoderKL(nn.Module):
    """encode(images NCHW in [-1,1]) -> moments; decode(latents NCHW) -> NCHW."""
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        if self.cfg.use_quant_conv:
            # diffusers AutoencoderKL: 1x1 convs around the bottleneck
            # (encode: quant_conv(moments); decode: post_quant_conv(z))
            self.quant_conv = nn.Conv(
                self.cfg.latent_channels * 2, (1, 1), dtype=self.dtype)
            self.post_quant_conv = nn.Conv(
                self.cfg.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, images):
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.encoder(x)
        if self.cfg.use_quant_conv:
            moments = self.quant_conv(moments)
        return jnp.transpose(moments, (0, 3, 1, 2))

    def decode(self, latents):
        z = jnp.transpose(latents, (0, 2, 3, 1)).astype(self.dtype)
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        img = self.decoder(z)
        return jnp.transpose(img, (0, 3, 1, 2))

    def full_pass(self, images):
        """encode -> decode; used only for parameter initialization so both
        halves of the autoencoder materialize params."""
        z = self(images, sample=False)
        return self.decode(z / self.cfg.scaling_factor + self.cfg.shift_factor)

    def __call__(self, images, rng=None, sample: bool = True):
        """Encode and sample the diagonal Gaussian posterior; returns scaled
        latents ready for noise injection (prepare_latents semantics)."""
        moments = self.encode_moments(images)
        mean, logvar = jnp.split(moments, 2, axis=1)
        if sample and rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar)
            z = mean + std * normal_like(rng, mean.shape, mean.dtype)
        else:
            z = mean
        z = (z - self.cfg.shift_factor) * self.cfg.scaling_factor
        return z
