"""CLIP text encoder in Flax.

Covers the three CLIP variants the reference model zoo needs
(feature/components/models.py + pipeline ``encode_prompt``):
  - SD-1.5: ViT-L/14 (hidden 768, quick_gelu), final-layer output
  - SD-2.1: OpenCLIP ViT-H (hidden 1024, gelu), final-layer output
  - SDXL/PGv2: ViT-L (hidden_states[-2]) + OpenCLIP bigG (hidden 1280,
    hidden_states[-2], pooled via text_projection)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention_fused


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = 'quick_gelu'
    layer_norm_eps: float = 1e-5
    projection_dim: Optional[int] = None   # set -> has text_projection head
    eos_token_id: int = 49407


def _clip_from_diffusers_config(d: dict,
                                base: 'CLIPTextConfig' = None
                                ) -> 'CLIPTextConfig':
    """Adapt a transformers CLIPTextConfig json so fine-tuned checkpoints
    with non-preset encoder shapes load exactly.  Whether a text_projection
    head exists follows the checkpoint's architectures list; otherwise the
    base spec's choice is kept (pipeline-level contract)."""
    base = base if base is not None else CLIPTextConfig()
    archs = d.get('architectures') or []
    if any('WithProjection' in a for a in archs):
        projection_dim = d.get('projection_dim', base.projection_dim)
    elif archs:
        projection_dim = None
    else:
        projection_dim = base.projection_dim
    return CLIPTextConfig(
        vocab_size=d.get('vocab_size', base.vocab_size),
        hidden_size=d.get('hidden_size', base.hidden_size),
        intermediate_size=d.get('intermediate_size', base.intermediate_size),
        num_hidden_layers=d.get('num_hidden_layers', base.num_hidden_layers),
        num_attention_heads=d.get('num_attention_heads',
                                  base.num_attention_heads),
        max_position_embeddings=d.get('max_position_embeddings',
                                      base.max_position_embeddings),
        hidden_act=d.get('hidden_act', base.hidden_act),
        layer_norm_eps=d.get('layer_norm_eps', base.layer_norm_eps),
        projection_dim=projection_dim,
        eos_token_id=d.get('eos_token_id', base.eos_token_id),
    )


CLIPTextConfig.from_diffusers_config = staticmethod(_clip_from_diffusers_config)

CLIP_VIT_L = CLIPTextConfig()
OPENCLIP_VIT_H = CLIPTextConfig(hidden_size=1024, intermediate_size=4096,
                                num_hidden_layers=23, num_attention_heads=16,
                                hidden_act='gelu')
OPENCLIP_BIGG = CLIPTextConfig(hidden_size=1280, intermediate_size=5120,
                               num_hidden_layers=32, num_attention_heads=20,
                               hidden_act='gelu', projection_dim=1280)


def tiny_clip_config(hidden: int = 32, projection_dim=None) -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=1000, hidden_size=hidden,
                          intermediate_size=hidden * 4, num_hidden_layers=2,
                          num_attention_heads=2, projection_dim=projection_dim,
                          eos_token_id=999)


def _act(name: str):
    if name == 'quick_gelu':
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm1')(x)
        d = cfg.hidden_size
        q = nn.Dense(d, dtype=self.dtype, name='q_proj')(h)
        k = nn.Dense(d, dtype=self.dtype, name='k_proj')(h)
        v = nn.Dense(d, dtype=self.dtype, name='v_proj')(h)
        a = attention_fused(q, k, v, cfg.num_attention_heads, mask=causal_mask)
        a = nn.Dense(d, dtype=self.dtype, name='out_proj')(a)
        x = x + a
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm2')(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name='fc1')(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(d, dtype=self.dtype, name='fc2')(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, pooled, hidden_states tuple).

    ``hidden_states[i]`` is the input to layer i (so hidden_states[-2] is the
    penultimate layer's output — what SDXL's encode_prompt consumes).
    Pooling takes the EOS-position token of the final-layernormed sequence,
    located via ``input_ids == eos_token_id`` argmax (transformers
    CLIPTextModel semantics).
    """
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name='token_embedding')(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name='position_embedding')(
            jnp.arange(s)[None, :].repeat(b, axis=0))
        x = tok + pos
        causal = jnp.triu(jnp.full((s, s), -3.4e38, dtype=self.dtype), k=1)
        causal = causal[None, None, :, :]

        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f'layers_{i}')(
                x, causal)
            hidden_states.append(x)

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name='final_layer_norm')(x)

        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, name='text_projection')(pooled)
        return last, pooled, tuple(hidden_states)
