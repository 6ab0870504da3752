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


# torch typed-storage class name -> numpy dtype (BFloat16Storage needs
# ml_dtypes, which jax already depends on)
def _torch_storage_dtypes():
    import ml_dtypes
    return {
        'FloatStorage': np.dtype(np.float32),
        'DoubleStorage': np.dtype(np.float64),
        'HalfStorage': np.dtype(np.float16),
        'BFloat16Storage': np.dtype(ml_dtypes.bfloat16),
        'LongStorage': np.dtype(np.int64),
        'IntStorage': np.dtype(np.int32),
        'ShortStorage': np.dtype(np.int16),
        'CharStorage': np.dtype(np.int8),
        'ByteStorage': np.dtype(np.uint8),
        'BoolStorage': np.dtype(np.bool_),
    }


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Read a torch pickle-zip ``.bin`` checkpoint WITHOUT torch.

    Older diffusers checkpoints ship only ``diffusion_pytorch_model.bin``
    (the reference loads them through torch.load inside from_pretrained,
    reference feature/components/models.py); this build's package runtime
    has no torch, so the zipfile layout (``archive/data.pkl`` +
    ``archive/data/<key>`` raw storages, torch>=1.6) is parsed with a
    restricted ``pickle.Unpickler``: only the tensor-rebuild globals are
    resolvable, everything else raises — arbitrary pickled code cannot
    execute. Legacy pre-1.6 tar-format files are rejected with a clear
    error.
    """
    import pickle
    import zipfile

    dtypes = _torch_storage_dtypes()
    try:
        zf = zipfile.ZipFile(path)
    except zipfile.BadZipFile:
        raise ValueError(
            f'{path} is not a torch zipfile checkpoint (legacy pre-1.6 '
            'torch .bin is not supported — re-save with a modern torch or '
            'convert to safetensors)')
    with zf:
        pkl_names = [n for n in zf.namelist() if n.endswith('data.pkl')]
        if not pkl_names:
            raise ValueError(f'{path}: no data.pkl inside the zip — not a '
                             'torch checkpoint')
        prefix = pkl_names[0][:-len('data.pkl')]
        storage_cache: Dict[str, np.ndarray] = {}

        def read_storage(dtype: np.dtype, key: str) -> np.ndarray:
            if key not in storage_cache:
                storage_cache[key] = np.frombuffer(
                    zf.read(f'{prefix}data/{key}'), dtype=dtype)
            return storage_cache[key]

        def rebuild_tensor_v2(storage, offset, size, stride,
                              requires_grad=False, hooks=None,
                              metadata=None):
            dtype, key = storage
            flat = read_storage(dtype, key)
            itemsize = flat.dtype.itemsize
            arr = np.lib.stride_tricks.as_strided(
                flat[offset:], shape=tuple(size),
                strides=tuple(s * itemsize for s in stride))
            # .copy() (not ascontiguousarray, which promotes 0-d to 1-d)
            return arr.copy()

        class _StateDict(dict):
            # Real nn.Module.state_dict() pickles carry a ``_metadata``
            # attribute on the OrderedDict (BUILD sets it via
            # __dict__.update); a plain dict has no instance __dict__, so
            # mapping OrderedDict -> dict crashes on every genuine
            # diffusers/transformers .bin. A dict subclass accepts it.
            pass

        class _Restricted(pickle.Unpickler):
            def find_class(self, module, name):
                if module == 'torch._utils':
                    if name in ('_rebuild_tensor_v2', '_rebuild_tensor'):
                        return rebuild_tensor_v2
                    if name == '_rebuild_parameter':
                        return lambda data, *a: data
                if module == 'torch' and name in dtypes:
                    return dtypes[name]
                if module == 'collections' and name == 'OrderedDict':
                    return _StateDict
                raise pickle.UnpicklingError(
                    f'{path}: refusing to unpickle {module}.{name} — only '
                    'plain tensor state_dicts are supported')

            def persistent_load(self, pid):
                # ('storage', <typed-storage dtype>, key, location, numel)
                if not (isinstance(pid, tuple) and pid
                        and pid[0] == 'storage'):
                    raise pickle.UnpicklingError(
                        f'{path}: unexpected persistent id {pid!r}')
                return (pid[1], pid[2])

        import io
        obj = _Restricted(io.BytesIO(zf.read(pkl_names[0]))).load()
    if isinstance(obj, dict) and 'state_dict' in obj \
            and isinstance(obj['state_dict'], dict):
        obj = obj['state_dict']
    if not isinstance(obj, dict):
        raise ValueError(f'{path}: checkpoint root is {type(obj).__name__}, '
                         'expected a tensor state_dict')
    return {k: v for k, v in obj.items() if isinstance(v, np.ndarray)}


_SHARD_RE = re.compile(r'-\d{5}-of-\d{5}$')


def _group_weight_files(files: Iterable[str], ext: str):
    """Group weight files by (base, variant): diffusers names weights
    ``<base>[.<variant>][-NNNNN-of-NNNNN].<ext>`` (variant e.g. 'fp16').
    Returns {(base, variant_or_None): [files]}."""
    groups: Dict[Tuple[str, str], list] = {}
    for f in sorted(files):
        stem = _SHARD_RE.sub('', f[:-len(ext) - 1])
        base, _, variant = stem.partition('.')
        groups.setdefault((base, variant or None), []).append(f)
    return groups


def load_safetensors_dir(path: str, variant: str = None
                         ) -> Dict[str, np.ndarray]:
    """Load the tensors of ONE weight set from a diffusers component dir
    (sharded files included).

    A component dir may carry several sets side by side — e.g. both
    ``diffusion_pytorch_model.safetensors`` and the
    ``diffusion_pytorch_model.fp16.safetensors`` variant, a common layout
    on the HF hub. Merging them (with alphabetical overwrite deciding the
    winner) would silently load a mixture, so exactly one set is chosen:
    the ``variant`` argument if given ('fp16'/'bf16'/…, or 'main' for the
    un-suffixed set), falling back per-component to the un-suffixed set
    when that variant is absent (diffusers ``from_pretrained(variant=…)``
    semantics — checkpoints often ship a variant for only some
    components); else the un-suffixed set when present (what
    diffusers ``from_pretrained`` loads by default, and the only choice
    reachable from the CLIs, which expose no variant flag); else the
    single variant present — and a ValueError only when several VARIANT
    sets exist with no un-suffixed set to prefer, listing the candidates.
    Falls back to torch ``.bin`` files (load_torch_bin) when the dir has
    no safetensors at all.
    """
    names = os.listdir(path)
    ext = 'safetensors'
    files = [f for f in names if f.endswith('.safetensors')]
    if not files:
        ext = 'bin'
        files = [f for f in names if f.endswith('.bin')]
        if not files:
            raise FileNotFoundError(f'no .safetensors or .bin in {path}')
    groups = _group_weight_files(files, ext)

    if variant is not None:
        want = None if variant == 'main' else variant
        matches = {k: v for k, v in groups.items() if k[1] == want}
        if not matches:
            # per-component fallback to the un-suffixed set, matching
            # diffusers from_pretrained(variant=...): real checkpoints
            # often ship a variant for only some components
            matches = {k: v for k, v in groups.items() if k[1] is None}
        if not matches:
            have = sorted({k[1] or 'main' for k in groups})
            raise FileNotFoundError(
                f'{path}: no {ext} files with variant {variant!r} '
                f'and no un-suffixed set to fall back to '
                f'(available: {have})')
        groups = matches
    if len(groups) > 1:
        main = {k: v for k, v in groups.items() if k[1] is None}
        if len(main) == 1:
            groups = main
        else:
            cands = sorted(f'{b}.{v}' if v else b for b, v in groups)
            raise ValueError(
                f'{path}: ambiguous weight sets {cands} — pass variant= '
                "(e.g. variant='fp16', or variant='main' for the "
                'un-suffixed set) to pick one')
    sel_files = next(iter(groups.values()))

    state: Dict[str, np.ndarray] = {}
    if ext == 'bin':
        for f in sel_files:
            state.update(load_torch_bin(os.path.join(path, f)))
        return state
    from safetensors import safe_open
    for f in sel_files:
        with safe_open(os.path.join(path, f), framework='numpy') as fh:
            for k in fh.keys():
                state[k] = fh.get_tensor(k)
    return state


def load_component_config(root: str, component: str) -> dict:
    p = os.path.join(root, component, 'config.json')
    with open(p) as f:
        return json.load(f)


def load_component_state(root: str, component: str, variant: str = None
                         ) -> Dict[str, np.ndarray]:
    return load_safetensors_dir(os.path.join(root, component),
                                variant=variant)
