"""Resize ops matching torch.nn.functional semantics used by the reference
(F.interpolate bilinear align_corners=False: extract_feature.py:118,
diffusion_feature.py:363-366, correspondence/aggregation_network.py:52-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_bilinear_nchw(x, size):
    """torch F.interpolate(x, size, mode='bilinear', align_corners=False) for
    NCHW.  jax.image.resize with antialias=False and 'linear' uses the same
    half-pixel-center sampling."""
    h, w = size
    x = jnp.asarray(x)
    b, c = x.shape[0], x.shape[1]
    return jax.image.resize(x, (b, c, h, w), method='linear', antialias=False)


def interpolate_nearest_nchw(x, size):
    h, w = size
    x = jnp.asarray(x)
    b, c = x.shape[0], x.shape[1]
    return jax.image.resize(x, (b, c, h, w), method='nearest', antialias=False)


def interpolate_bilinear_nhwc(x, size):
    h, w = size
    x = jnp.asarray(x)
    b, c = x.shape[0], x.shape[-1]
    return jax.image.resize(x, (b, h, w, c), method='linear', antialias=False)
