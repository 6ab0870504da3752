"""Built-in layer configurations.

The reference ships JSON layer configs (feature/configs/*.json: layer-id ->
bool maps, SURVEY §2.2) selecting which activations each published experiment
extracts.  Here the named selections live as Python data — same byte-exact
layer ids — and can be materialized to JSON for CLI use.

Naming: '{model}-{selection}' mirrors the reference file stems
(config_15_practical.json -> '15-practical').

Selections (paper "Not All Diffusion Model Activations ...", reference
README.md:111-141):
  legacy     — conventional up-block upsampler/res outputs (prior-work layers)
  practical  — the paper's recommended discriminative set (Ours)
  amalgamation / amalgamation-small / pg-amalgamation — ablation sets
  full       — every layer (use TapSpec.all() / layer=None instead for the
               complete surface; 'full' here enumerates at runtime)
"""

from __future__ import annotations

import json
import os

BUILTIN_CONFIGS = {
    # reference feature/configs/config_15_practical.json
    '15-practical': (
        'up-level1-repeat1-vit-block0-cross-q',
        'up-level1-repeat2-res-out',
        'up-level2-repeat1-vit-block0-cross-q',
        'up-level3-repeat0-vit-block0-self-k',
    ),
    # reference feature/configs/config_15_legacy.json
    '15-legacy': (
        'up-level0-upsampler-out',
        'up-level1-upsampler-out',
        'up-level2-upsampler-out',
        'up-level3-repeat2-vit-out',
    ),
    # reference feature/configs/config_xl_practical.json
    'xl-practical': (
        'up-level0-repeat0-vit-block7-out',
        'up-level0-repeat0-vit-block5-out',
        'up-level1-repeat0-vit-block0-cross-q',
        'up-level1-repeat0-vit-block0-out',
    ),
    # reference feature/configs/config_xl_legacy.json
    'xl-legacy': (
        'up-level0-upsampler-out',
        'up-level1-upsampler-out',
        'up-level2-repeat2-res-out',
    ),
    # reference feature/configs/config_15_amalgamation(.small).json
    '15-amalgamation': (
        'up-level1-repeat1-vit-block0-cross-q',
        'up-level2-repeat1-vit-block0-cross-q',
        'up-level2-upsampler-out',
        'up-level3-repeat0-vit-block0-self-k',
    ),
    '15-amalgamation-small': (
        'up-level2-repeat1-vit-block0-cross-q',
        'up-level2-upsampler-out',
        'up-level3-repeat0-vit-block0-self-k',
    ),
    # reference feature/configs/config_pg_amalgamation.json
    'pg-amalgamation': (
        'up-level0-repeat0-vit-block3-out',
    ),
}


def get_builtin_config(name: str) -> dict:
    """'xl-practical' -> {layer-id: True, ...} (FeatureExtractor layer arg)."""
    if name not in BUILTIN_CONFIGS:
        raise KeyError(f'unknown config {name!r}; known: '
                       f'{sorted(BUILTIN_CONFIGS)}')
    return {k: True for k in BUILTIN_CONFIGS[name]}


def resolve_layer_config(layer):
    """CLI-facing resolver: a builtin name, a JSON path, a dict, or None."""
    if isinstance(layer, str) and layer in BUILTIN_CONFIGS:
        return get_builtin_config(layer)
    return layer


def write_config_json(name: str, path: str):
    with open(path, 'w') as f:
        json.dump(get_builtin_config(name), f, indent=1)


def edit_config(path: str, updates: dict, out_path: str = None):
    """Batch-edit a layer config (reference feature/configs/edit_config.py)."""
    with open(path) as f:
        cfg = json.load(f)
    cfg.update(updates)
    with open(out_path or path, 'w') as f:
        json.dump(cfg, f, indent=1)
    return cfg
