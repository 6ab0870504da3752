"""BERT text encoder for HunyuanDiT (the reference's `text_encoder` component
is a BertModel per the HunyuanDiT-Diffusers checkpoint layout;
feature/components/models.py:134-149 loads the pipeline that carries it).

Standard post-LN BERT encoder; param naming maps HF keys structurally via
models/convert.py (torch ``encoder.layer.0.attention.self.query.weight`` is
normalized with the segment strips below).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention_fused


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 47020
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def _bert_from_hf_config(d: dict, base: 'BertConfig' = None) -> 'BertConfig':
    """Adapt from a transformers BertConfig json (checkpoint text_encoder
    dir); keys missing from the json fall back to the caller's preset."""
    b = base if base is not None else BertConfig()
    return BertConfig(
        vocab_size=d.get('vocab_size', b.vocab_size),
        hidden_size=d.get('hidden_size', b.hidden_size),
        num_hidden_layers=d.get('num_hidden_layers', b.num_hidden_layers),
        num_attention_heads=d.get('num_attention_heads',
                                  b.num_attention_heads),
        intermediate_size=d.get('intermediate_size', b.intermediate_size),
        max_position_embeddings=d.get('max_position_embeddings',
                                      b.max_position_embeddings),
        type_vocab_size=d.get('type_vocab_size', b.type_vocab_size),
        layer_norm_eps=d.get('layer_norm_eps', b.layer_norm_eps),
    )


BertConfig.from_hf_config = staticmethod(_bert_from_hf_config)

HUNYUAN_BERT = BertConfig()


def tiny_bert_config() -> BertConfig:
    return BertConfig(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.cfg
        h = cfg.hidden_size
        q = nn.Dense(h, dtype=self.dtype, name='attention_self_query')(x)
        k = nn.Dense(h, dtype=self.dtype, name='attention_self_key')(x)
        v = nn.Dense(h, dtype=self.dtype, name='attention_self_value')(x)
        attn = attention_fused(q, k, v, cfg.num_attention_heads, mask=mask)
        attn = nn.Dense(h, dtype=self.dtype, name='attention_output_dense')(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='attention_output_LayerNorm')(x + attn)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name='intermediate_dense')(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(h, dtype=self.dtype, name='output_dense')(inter)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='output_LayerNorm')(x + out)
        return x


class BertTextModel(nn.Module):
    """__call__(input_ids, attention_mask) -> last_hidden_state (B, S, H)."""
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name='word_embeddings')(input_ids)
        pos = jnp.arange(s)[None]
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         dtype=self.dtype, name='position_embeddings')(pos)
        x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                         dtype=self.dtype, name='token_type_embeddings')(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='LayerNorm')(x)

        mask = None
        if attention_mask is not None:
            mask = (1.0 - attention_mask[:, None, None, :]
                    .astype(jnp.float32)) * -1e9

        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, dtype=self.dtype, name=f'layer_{i}')(x, mask)
        return x
