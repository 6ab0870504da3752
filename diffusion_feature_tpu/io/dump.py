"""Feature dump writer: reproduces the reference CLI's on-disk output format
matrix (reference: extract_feature.py:113-148, diagrammed in
figures/output_format.jpg).

Formats:
  - per-layer:      outdir/<layer>/<name>.npy          (default)
  - sample-first:   outdir/<name>/<layer>.npy          (--sample_name_first)
  - aggregated:     outdir/<name>.npy                  (--aggregate_output)

Names are either ``<split><global_index>`` or the original (possibly nested)
filename stem (--use_original_filename / --nested_input_dir,
extract_feature.py:68-75).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from ..ops.resize import interpolate_nearest_nchw


def _as_numpy(feat, dtype=np.float16) -> np.ndarray:
    arr = np.asarray(feat)
    if arr.dtype != dtype:
        arr = arr.astype(dtype)
    return arr


def sample_name(index: int, split: str, original: str | None, use_original: bool) -> str:
    """Output-name rule: original stem when requested, else ``split+index``
    (extract_feature.py:130, :143)."""
    return original if (use_original and original is not None) else f'{split}{index}'


def aggregate_features(features: Dict[str, np.ndarray]) -> np.ndarray:
    """--aggregate_output: bilinearly resize every layer to the max spatial
    size present and concat along channels -> (B, sum(C), h, w)
    (extract_feature.py:113-126).

    torch ``F.interpolate(v, size)`` defaults to mode='nearest' and an int
    size resizes *both* spatial dims; reproduced here.
    """
    sizes = [np.asarray(v).shape[-1] for v in features.values()]
    target = int(np.max(sizes))
    resized = []
    for v in features.values():
        arr = np.asarray(v, dtype=np.float32)
        if arr.shape[-2] != target or arr.shape[-1] != target:
            arr = np.asarray(interpolate_nearest_nchw(arr, (target, target)))
        resized.append(arr)
    return np.concatenate(resized, axis=1)


def _write(path: str, arr: np.ndarray, writer=None):
    if writer is not None:
        writer.submit(path, arr)
    else:
        np.save(path, arr)


def save_batch(
    features: Dict[str, np.ndarray],
    out_dir: str,
    *,
    batch_start_index: int,
    original_names: Sequence[str] | None = None,
    split: str = 'train',
    use_original_filename: bool = False,
    sample_name_first: bool = False,
    aggregate_output: bool = False,
    nested: bool = False,
    dtype=np.float16,
    writer=None,
) -> List[str]:
    """Write one extracted batch to disk; returns the written paths.

    ``writer``: optional native AsyncDumpWriter — IO then overlaps the next
    batch's device compute (caller must flush()/close())."""
    written = []
    if not features:
        raise ValueError(
            'no features to write: the extraction returned an empty dict '
            '(every requested layer id was unknown/filtered — run with '
            'layer validation on, or --show_all_layers, to see valid ids)')
    some = next(iter(features.values()))
    batch = np.asarray(some).shape[0]

    if aggregate_output:
        agg = aggregate_features(features)
        for j in range(batch):
            name = sample_name(
                batch_start_index + j,
                split,
                original_names[j] if original_names else None,
                use_original_filename,
            )
            if nested and '/' in name:
                os.makedirs(os.path.join(out_dir, name.rsplit('/', 1)[0]), exist_ok=True)
            else:
                os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, name + '.npy')
            _write(path, _as_numpy(agg[j], dtype), writer)
            written.append(path)
        return written

    for j in range(batch):
        name = sample_name(
            batch_start_index + j,
            split,
            original_names[j] if original_names else None,
            use_original_filename,
        )
        for layer, v in features.items():
            feat = _as_numpy(np.asarray(v)[j], dtype)
            if sample_name_first:
                d = os.path.join(out_dir, name)
                path = os.path.join(d, layer + '.npy')
            else:
                d = os.path.join(out_dir, layer)
                path = os.path.join(d, name + '.npy')
            os.makedirs(os.path.dirname(path), exist_ok=True)
            _write(path, feat, writer)
            written.append(path)
    return written
