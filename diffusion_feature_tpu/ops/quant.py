"""Weight-only int8 quantization for Dense layers.

The reference loads Flux's T5-XXL encoder in 8-bit via bitsandbytes
(feature/components/models.py:158-163) to fit the 11-GiB GPU budget.  The
TPU-native equivalent is symmetric per-output-channel int8 weights stored in
the param tree (halving persistent HBM: T5-XXL 9.4 -> 4.7 GiB) with the
dequantize folded into the matmul at apply time — XLA fuses the
int8->compute-dtype convert + scale into the dot's operand pipeline, so no
full-precision weight copy persists.

Numerics match bitsandbytes' LLM.int8 weight path closely enough for text
encoding (per-channel absmax scaling; no outlier decomposition — T5 encoder
activations at inference don't need it for feature parity, validated by the
cosine-similarity test against the fp32 encoder).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_int8(w) -> tuple:
    """(in, out) float kernel -> (int8 kernel, (out,) f32 scale), symmetric
    per-output-channel absmax."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def dequantize_int8(q, scale, dtype=jnp.float32):
    return q.astype(dtype) * scale.astype(dtype)[None, :]


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with int8 weight-only quantization.

    Params: ``kernel_q`` (in, out) int8 + ``scale`` (out,) f32 (+ optional
    ``bias``).  At init the kernel is zeros — this module only makes sense
    with converted real weights (models/convert.py quantizes checkpoint
    tensors on the fly when the template carries a kernel_q leaf).  The
    dequantize (convert + per-channel scale) fuses into the dot's operand
    pipeline under XLA, so only the int8 copy persists in HBM.
    """
    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel_q = self.param(
            'kernel_q', lambda rng, shape: jnp.zeros(shape, jnp.int8),
            (in_dim, self.features))
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        w = kernel_q.astype(self.dtype) * scale.astype(self.dtype)[None, :]
        y = x @ w
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y
