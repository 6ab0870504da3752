"""HF checkpoint -> Flax param-tree conversion.

The reference loads pretrained diffusers/transformers checkpoints from the HF
hub (feature/components/models.py).  This build has zero network egress, so
conversion reads *local* diffusers-format directories (safetensors / .bin) and
maps tensors onto our module trees.

The mapping is structural, not a hand-written per-model table: our Flax
module/param names are chosen so that a torch key normalized by
``'.' -> '_'`` (plus a few segment strips) equals our flattened param path.
Each tensor is transposed per its role (Linear (O,I)->(I,O); Conv
OIHW->HWIO) and shape-verified against the template tree.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, Tuple

import numpy as np
import jax.numpy as jnp
from flax import traverse_util

# segments present in torch module paths but flattened away in our modules
_STRIP_SEGMENTS = (
    'text_model', 'encoder_layers', 'self_attn', 'mlp', 'embeddings',
)


def _normalize_key(key: str) -> str:
    k = key.replace('.', '_')
    # strip known wrapper segments (CLIP text model)
    k = k.replace('text_model_', '')
    k = k.replace('encoder_layers_', 'layers_')
    k = k.replace('_self_attn_', '_')
    k = k.replace('_mlp_', '_')
    k = k.replace('embeddings_', '')
    # attention out projection list wrapper: to_out.0 -> to_out_0 (already via .->_)
    return k


_LEAF_CANDIDATES = {
    # T5LayerNorm keeps the literal 'weight' param name.  'kernel_q' (int8
    # weight-only Dense, ops/quant.py) must outrank 'scale' so a quantized
    # layer's checkpoint weight quantizes instead of colliding with its own
    # per-channel scale param.
    'weight': ('kernel', 'kernel_q', 'scale', 'embedding', 'weight'),
    'bias': ('bias',),
}


def _transpose_for(leaf: str, ours_shape: Tuple[int, ...], t: np.ndarray) -> np.ndarray:
    if leaf == 'kernel':
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if t.shape != tuple(ours_shape):
        raise ValueError(f'shape mismatch: got {t.shape}, want {tuple(ours_shape)}')
    return t


def convert_torch_state(
    state: Dict[str, np.ndarray],
    template_params,
    *,
    dtype=None,
    strict: bool = True,
):
    """Map a torch state_dict onto ``template_params`` (our init'd tree).

    Returns (params, missing_keys, unused_keys).
    """
    flat_template = traverse_util.flatten_dict(template_params)
    by_norm: Dict[str, Tuple] = {}
    for path, v in flat_template.items():
        by_norm['_'.join(path)] = path

    out = dict(flat_template)
    used = set()
    unused = []
    for key, tensor in state.items():
        base, _, leaf = key.rpartition('.')
        norm_base = _normalize_key(base)
        placed = False
        for cand in _LEAF_CANDIDATES.get(leaf, (leaf,)):
            norm = f'{norm_base}_{cand}' if norm_base else cand
            if norm in by_norm:
                path = by_norm[norm]
                if cand == 'kernel_q':
                    # quantize the full-precision checkpoint tensor on the
                    # fly: int8 kernel here, f32 per-channel scale into the
                    # sibling 'scale' param
                    from ..ops.quant import quantize_int8
                    t = np.asarray(tensor, np.float32).T
                    if t.shape != tuple(flat_template[path].shape):
                        raise ValueError(
                            f'shape mismatch: got {t.shape}, want '
                            f'{tuple(flat_template[path].shape)}')
                    q_arr, s_arr = quantize_int8(t)
                    spath = path[:-1] + ('scale',)
                    out[path] = jnp.asarray(q_arr)
                    out[spath] = jnp.asarray(s_arr)
                    used.add(norm)
                    used.add('_'.join(spath))
                    placed = True
                    break
                try:
                    arr = _transpose_for(cand, flat_template[path].shape,
                                         np.asarray(tensor))
                except ValueError as e:
                    raise ValueError(f'{key} -> {"/".join(path)}: {e}') from e
                if dtype is not None:
                    arr = arr.astype(dtype)
                out[path] = jnp.asarray(arr)
                used.add(norm)
                placed = True
                break
        if not placed:
            unused.append(key)
    missing = [('/'.join(p)) for n, p in by_norm.items() if n not in used]
    if strict and missing:
        raise ValueError(f'{len(missing)} params not found in checkpoint, '
                         f'e.g. {missing[:5]}')
    return traverse_util.unflatten_dict(out), missing, unused


def rename_t5_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF T5 encoder keys -> our T5EncoderModel param paths
    ('encoder.block.N.layer.0.SelfAttention.q' -> 'block_N.attn.q', etc.)."""
    out = {}
    for k, v in state.items():
        kk = (k.replace('encoder.block.', 'block_')
               .replace('.layer.0.SelfAttention.', '.attn.')
               .replace('.layer.0.layer_norm.', '.ln1.')
               .replace('.layer.1.DenseReluDense.wi_0.', '.wi_0.')
               .replace('.layer.1.DenseReluDense.wi_1.', '.wi_1.')
               .replace('.layer.1.DenseReluDense.wi.', '.wi_0.')
               .replace('.layer.1.DenseReluDense.wo.', '.wo.')
               .replace('.layer.1.layer_norm.', '.ln2.')
               .replace('encoder.final_layer_norm.', 'final_layer_norm.')
               .replace('encoder.embed_tokens.', 'shared.')
               .replace('attn.relative_attention_bias.',
                        'relative_attention_bias.'))
        if kk.startswith('block_0.relative'):
            kk = kk.replace('block_0.relative', 'relative')
        out[kk] = v
    return out


def rename_bert_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF BertModel keys -> our BertTextModel param paths."""
    out = {}
    for k, v in state.items():
        if k.endswith('position_ids'):
            continue
        kk = (k.replace('bert.', '')
               .replace('embeddings.word_embeddings.', 'word_embeddings.')
               .replace('embeddings.position_embeddings.',
                        'position_embeddings.')
               .replace('embeddings.token_type_embeddings.',
                        'token_type_embeddings.')
               .replace('embeddings.LayerNorm.', 'LayerNorm.')
               .replace('encoder.layer.', 'layer_')
               .replace('.attention.self.query.', '.attention_self_query.')
               .replace('.attention.self.key.', '.attention_self_key.')
               .replace('.attention.self.value.', '.attention_self_value.')
               .replace('.attention.output.dense.',
                        '.attention_output_dense.')
               .replace('.attention.output.LayerNorm.',
                        '.attention_output_LayerNorm.')
               .replace('.intermediate.dense.', '.intermediate_dense.')
               .replace('.output.dense.', '.output_dense.')
               .replace('.output.LayerNorm.', '.output_LayerNorm.'))
        out[kk] = v
    return out


def rename_for_text_encoder(state: Dict[str, np.ndarray], encoder
                            ) -> Dict[str, np.ndarray]:
    """Dispatch HF-key renaming by our encoder module type (CLIP keys already
    normalize structurally via _normalize_key)."""
    name = type(encoder).__name__
    if name == 'T5EncoderModel':
        return rename_t5_keys(state)
    if name == 'BertTextModel':
        return rename_bert_keys(state)
    return state


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a diffusers component dir (handles sharded
    files via the index json)."""
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(path)
        if f.endswith('.safetensors')
    )
    if not files:
        raise FileNotFoundError(f'no safetensors in {path}')
    state = {}
    for f in files:
        with safe_open(os.path.join(path, f), framework='numpy') as fh:
            for k in fh.keys():
                state[k] = fh.get_tensor(k)
    return state


def load_component_config(root: str, component: str) -> dict:
    p = os.path.join(root, component, 'config.json')
    with open(p) as f:
        return json.load(f)


def load_component_state(root: str, component: str) -> Dict[str, np.ndarray]:
    return load_safetensors_dir(os.path.join(root, component))
