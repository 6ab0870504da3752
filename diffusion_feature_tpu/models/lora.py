"""Offline LoRA weight merging.

The reference defers to ``pipe.load_lora_weights`` (diffusers/peft runtime
adapters, feature/diffusion_feature.py:50-53).  On TPU, runtime adapter
indirection costs an extra matmul per projection inside the jitted graph, so
we *merge* instead: W' = W + (alpha/r) * (up @ down) folded into the param
tree before compilation — bitwise equivalent at inference and free at runtime.

Supported key dialects (auto-detected):
  - peft/diffusers:  unet.<path>.lora_A.weight / lora_B.weight
  - legacy diffusers attn-procs: <path>.lora.down.weight / up.weight
  - kohya: lora_unet_<path-with-_>.lora_down.weight / lora_up.weight + .alpha
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import traverse_util

from .convert import _normalize_key


def _read_lora_file(root: str, filename: Optional[str]) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    path = os.path.join(root, filename) if filename else root
    if os.path.isdir(path):
        cands = sorted(f for f in os.listdir(path) if f.endswith('.safetensors'))
        if not cands:
            raise FileNotFoundError(f'no safetensors in {path}')
        path = os.path.join(path, cands[0])
    state = {}
    with safe_open(path, framework='numpy') as fh:
        for k in fh.keys():
            state[k] = fh.get_tensor(k)
    return state


def collect_lora_pairs(state: Dict[str, np.ndarray]) -> Dict[str, Tuple[np.ndarray, np.ndarray, float]]:
    """Group raw keys into {torch-module-path: (down, up, scale)}."""
    downs, ups, alphas = {}, {}, {}
    for key, t in state.items():
        k = key
        if k.startswith('lora_unet_'):
            # kohya: underscores for dots
            base = k[len('lora_unet_'):]
            if base.endswith('.lora_down.weight'):
                downs[base[:-len('.lora_down.weight')]] = t
            elif base.endswith('.lora_up.weight'):
                ups[base[:-len('.lora_up.weight')]] = t
            elif base.endswith('.alpha'):
                alphas[base[:-len('.alpha')]] = float(np.asarray(t))
            continue
        if k.startswith('unet.'):
            k = k[len('unet.'):]
        if k.endswith('.lora_A.weight'):
            downs[k[:-len('.lora_A.weight')]] = t
        elif k.endswith('.lora_B.weight'):
            ups[k[:-len('.lora_B.weight')]] = t
        elif k.endswith('.lora.down.weight'):
            downs[k[:-len('.lora.down.weight')]] = t
        elif k.endswith('.lora.up.weight'):
            ups[k[:-len('.lora.up.weight')]] = t
        elif k.endswith('.alpha'):
            alphas[k[:-len('.alpha')]] = float(np.asarray(t))

    pairs = {}
    for base, down in downs.items():
        up = ups.get(base)
        if up is None:
            continue
        rank = down.shape[0]
        scale = alphas.get(base, float(rank)) / rank
        pairs[base] = (down, up, scale)
    return pairs


def apply_lora_to_params(params, root: str, filename: Optional[str] = None,
                         *, weight: float = 1.0):
    """Merge a LoRA checkpoint into a Flax param tree (ours), returning the
    updated tree.  Unmatched adapter keys are skipped (they may target text
    encoders the caller merges separately)."""
    state = _read_lora_file(root, filename)
    pairs = collect_lora_pairs(state)

    flat = traverse_util.flatten_dict(params)
    by_norm = {'_'.join(p): p for p in flat}
    n_merged = 0
    for base, (down, up, scale) in pairs.items():
        norm = _normalize_key(base.replace('_', '.') if '.' not in base else base)
        path = by_norm.get(f'{norm}_kernel')
        if path is None:
            continue
        d = np.asarray(down, np.float32)
        u = np.asarray(up, np.float32)
        if d.ndim == 4:      # 1x1-conv LoRA
            d, u = d[..., 0, 0], u[..., 0, 0]
        delta = (u @ d) * (scale * weight)          # torch (O, I)
        w = flat[path]
        if w.ndim == 2:
            delta_ours = delta.T                    # (I, O)
        elif w.ndim == 4:                           # HWIO 1x1 conv kernel
            delta_ours = delta.T[None, None]
        else:
            continue
        if delta_ours.shape != w.shape:
            continue
        flat[path] = (w.astype(jnp.float32) + jnp.asarray(delta_ours)).astype(w.dtype)
        n_merged += 1
    if n_merged == 0:
        raise ValueError('LoRA checkpoint matched no parameters; '
                         'check key dialect / model version')
    return traverse_util.unflatten_dict(flat)
