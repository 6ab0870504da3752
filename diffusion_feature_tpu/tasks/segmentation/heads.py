"""Segmentation heads and adapters in Flax.

The reference trains mmseg's UPerHead + FCNHead over adapted diffusion
features (segmentation/models/diffusion_segmentor.py + configs/ade_*.py).
mmseg itself is NOT ported — these are native Flax implementations of the
same architectures:

  ResBlockAdapter — per-layer zero-init residual conv adapter
                    (diffusion_segmentor.py:23-41: conv3x3+BN x2, all weights
                    zero-initialized so the adapter starts as identity)
  UPerHead        — PSP pooling on the deepest level + FPN fusion
                    (mmseg UPerHead semantics; config ade_sdxl.py:21-35)
  FCNHead         — auxiliary head (num_convs conv blocks + classifier)

All heads run NCHW at the interface (reference layout) and NHWC internally.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ResBlockAdapter(nn.Module):
    """x + BN(conv(relu(BN(conv(x))))) with everything zero-init — identity
    at step 0 (reference ResBlock :23-41).  NCHW in/out, fp32 compute."""
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(jnp.float32).transpose(0, 2, 3, 1)
        res = h
        h = nn.Conv(self.dim, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, name='conv1')(h)
        h = nn.BatchNorm(use_running_average=not train,
                         scale_init=nn.initializers.zeros, name='bn1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, name='conv2')(h)
        h = nn.BatchNorm(use_running_average=not train,
                         scale_init=nn.initializers.zeros, name='bn2')(h)
        return (res + h).transpose(0, 3, 1, 2)


class ConvModule(nn.Module):
    """conv + BN + ReLU (mmseg ConvModule)."""
    channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.channels, (self.kernel, self.kernel), padding=pad,
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, name='bn')(x)
        return nn.relu(x)


def _resize_nhwc(x, hw):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b,) + tuple(hw) + (c,), method='bilinear')


class UPerHead(nn.Module):
    """Unified Perceptual Parsing head: PSP on the last input + FPN.

    ``in_channels`` per level (shallow -> deep); seg logits at the finest
    input resolution.  NCHW interface.
    """
    in_channels: Sequence[int]
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    num_classes: int = 150
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False,
                 dropout_rng=None):
        xs = [x.astype(jnp.float32).transpose(0, 2, 3, 1) for x in inputs]

        # PSP on the deepest level — exact adaptive pooling (mmseg uses
        # AdaptiveAvgPool2d; fixed windows give wrong pyramid sizes when the
        # scale doesn't divide the feature map)
        from ...store import adaptive_avg_pool2d
        deep = xs[-1]
        b, h, w, c = deep.shape
        psp_outs = [deep]
        for i, scale in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool2d(
                deep.transpose(0, 3, 1, 2), (scale, scale)).transpose(0, 2, 3, 1)
            pooled = ConvModule(self.channels, 1, name=f'psp_{i}')(pooled, train)
            psp_outs.append(_resize_nhwc(pooled, (h, w)))
        psp = ConvModule(self.channels, 3, name='bottleneck')(
            jnp.concatenate(psp_outs, axis=-1), train)

        # FPN laterals (all levels but the last) + top-down pathway
        laterals = [
            ConvModule(self.channels, 1, name=f'lateral_{i}')(x, train)
            for i, x in enumerate(xs[:-1])
        ] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize_nhwc(
                laterals[i], laterals[i - 1].shape[1:3])
        fpn_outs = [
            ConvModule(self.channels, 3, name=f'fpn_{i}')(laterals[i], train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]

        target_hw = fpn_outs[0].shape[1:3]
        fpn_outs = [_resize_nhwc(f, target_hw) for f in fpn_outs]
        out = ConvModule(self.channels, 3, name='fpn_bottleneck')(
            jnp.concatenate(fpn_outs, axis=-1), train)
        if train and self.dropout_ratio > 0 and dropout_rng is not None:
            # mmseg uses Dropout2d: whole CHANNELS drop per sample
            keep = jax.random.bernoulli(
                dropout_rng, 1 - self.dropout_ratio,
                (out.shape[0], 1, 1, out.shape[-1]))
            out = out * keep / (1 - self.dropout_ratio)
        logits = nn.Conv(self.num_classes, (1, 1), name='conv_seg')(out)
        return logits.transpose(0, 3, 1, 2)


class FCNHead(nn.Module):
    """Auxiliary FCN head (mmseg FCNHead, num_convs=1 per config)."""
    channels: int = 512
    num_convs: int = 1
    num_classes: int = 150
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, dropout_rng=None):
        h = x.astype(jnp.float32).transpose(0, 2, 3, 1)
        for i in range(self.num_convs):
            h = ConvModule(self.channels, 3, name=f'conv_{i}')(h, train)
        if train and self.dropout_ratio > 0 and dropout_rng is not None:
            keep = jax.random.bernoulli(
                dropout_rng, 1 - self.dropout_ratio,
                (h.shape[0], 1, 1, h.shape[-1]))   # Dropout2d semantics
            h = h * keep / (1 - self.dropout_ratio)
        logits = nn.Conv(self.num_classes, (1, 1), name='conv_seg')(h)
        return logits.transpose(0, 3, 1, 2)
