"""T5 v1.1 encoder stack in Flax — the text encoder for PixArt-α/Σ, Flux, and
DeepFloyd-IF (reference loads it inside those diffusers pipelines;
feature/components/models.py:71-172).

Implements: relative-position-bias attention (32 buckets / 128 max distance,
bias on layer 0 shared by all layers), T5 RMS LayerNorm (no mean subtraction,
no bias), gated-GELU feed-forward, final RMS norm.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import split_heads, merge_heads
from ..ops.quant import Int8Dense


def _dense(cfg, features, dtype, name):
    """Projection factory: int8 weight-only or plain Dense (both biasless,
    the T5 convention)."""
    if cfg.quantize_int8:
        return Int8Dense(features, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name)


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    # int8 weight-only projections (reference loads Flux's T5 in 8-bit,
    # feature/components/models.py:158-163); requires converted real weights
    quantize_int8: bool = False


def _t5_from_hf_config(d: dict, base: 'T5Config' = None) -> 'T5Config':
    """Adapt from a transformers T5Config json (checkpoint text_encoder dir)
    so fine-tunes/tiny checkpoints that deviate from the preset load exactly.
    Keys MISSING from the json fall back to the caller's ``base`` preset
    (hunyuan's mT5 differs from flux/pixart's T5-XXL in every dimension —
    hardcoded defaults would silently build the wrong architecture);
    quantize_int8 always carries over from base."""
    b = base if base is not None else T5Config()
    return T5Config(
        vocab_size=d.get('vocab_size', b.vocab_size),
        d_model=d.get('d_model', b.d_model),
        d_kv=d.get('d_kv', b.d_kv),
        d_ff=d.get('d_ff', b.d_ff),
        num_layers=d.get('num_layers', b.num_layers),
        num_heads=d.get('num_heads', b.num_heads),
        relative_attention_num_buckets=d.get(
            'relative_attention_num_buckets',
            b.relative_attention_num_buckets),
        relative_attention_max_distance=d.get(
            'relative_attention_max_distance',
            b.relative_attention_max_distance),
        layer_norm_epsilon=d.get('layer_norm_epsilon', b.layer_norm_epsilon),
        quantize_int8=b.quantize_int8,
    )


T5Config.from_hf_config = staticmethod(_t5_from_hf_config)

T5_XXL = T5Config()


def tiny_t5_config() -> T5Config:
    return T5Config(vocab_size=1000, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_heads=4)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional bucketing (host-side numpy; positions are static)."""
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)
    max_exact = n // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact) * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    ret += np.where(is_small, rp, large)
    return ret


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        w = self.param('weight', nn.initializers.ones, (self.dim,))
        return (w * x).astype(self.dtype)


class T5Attention(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask=None):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        q = _dense(cfg, inner, self.dtype, 'q')(x)
        k = _dense(cfg, inner, self.dtype, 'k')(x)
        v = _dense(cfg, inner, self.dtype, 'v')(x)
        qh, kh, vh = (split_heads(t, cfg.num_heads) for t in (q, k, v))
        # T5 uses no 1/sqrt(d) scaling (folded into init)
        scores = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores + position_bias
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return _dense(cfg, cfg.d_model, self.dtype, 'o')(merge_heads(out))


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask=None):
        cfg = self.cfg
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, dtype=self.dtype,
                        name='ln1')(x)
        x = x + T5Attention(cfg, dtype=self.dtype, name='attn')(
            h, position_bias, mask)
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, dtype=self.dtype,
                        name='ln2')(x)
        wi0 = _dense(cfg, cfg.d_ff, self.dtype, 'wi_0')(h)
        wi1 = _dense(cfg, cfg.d_ff, self.dtype, 'wi_1')(h)
        ff = nn.gelu(wi0, approximate=True) * wi1
        x = x + _dense(cfg, cfg.d_model, self.dtype, 'wo')(ff)
        return x


class T5EncoderModel(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name='shared')(input_ids)

        # relative position bias (shared across layers, from layer 0)
        pos = np.arange(s)
        rel = pos[None, :] - pos[:, None]
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads,
            dtype=self.dtype, name='relative_attention_bias')
        bias = bias_table(jnp.asarray(buckets))          # (s, s, H)
        position_bias = jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, s, s)

        mask = None
        if attention_mask is not None:
            mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f'block_{i}')(
                x, position_bias, mask)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, dtype=self.dtype,
                        name='final_layer_norm')(x)
        return x
