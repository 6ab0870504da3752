"""Dataset settings + split handling for the label-scarce task.

Reference: scarce_segmentation/segmentation/data_util.py (per-dataset
settings; Horse-21: 21 classes / 10 ensemble members / 256x256, :65-75) and
datasets.py ``shuffle_split`` (:45-58).
"""

from __future__ import annotations

import glob
import os
import random
from typing import Dict, List, Tuple

import numpy as np

DATASET_SETTINGS: Dict[str, dict] = {
    'horse_21': dict(number_class=21, model_num=10, dim=[256, 256, None],
                     ignore_label=255),
    'face_34': dict(number_class=34, model_num=10, dim=[256, 256, None],
                    ignore_label=255),
    'cat_15': dict(number_class=15, model_num=10, dim=[256, 256, None],
                   ignore_label=255),
}


def get_dataset_setting(category: str) -> dict:
    if category not in DATASET_SETTINGS:
        raise KeyError(f'unknown dataset {category!r}; known: '
                       f'{sorted(DATASET_SETTINGS)}')
    return dict(DATASET_SETTINGS[category])


def shuffle_split(image_paths: List[str], label_paths: List[str],
                  train_num: int, seed: int = 0):
    """Random train/test reshuffle (reference datasets.py:45-58)."""
    order = list(range(len(image_paths)))
    random.Random(seed).shuffle(order)
    tr = order[:train_num]
    te = order[train_num:]
    return ([image_paths[i] for i in tr], [label_paths[i] for i in tr],
            [image_paths[i] for i in te], [label_paths[i] for i in te])


def list_feature_label_pairs(feature_dir: str, label_dir: str
                             ) -> Tuple[List[str], List[str]]:
    """Match dumped .npy features with label images by stem."""
    feats = sorted(glob.glob(os.path.join(feature_dir, '*.npy')))
    pairs_f, pairs_l = [], []
    for f in feats:
        stem = os.path.splitext(os.path.basename(f))[0]
        for ext in ('.png', '.npy', '.bmp', '.jpg'):
            cand = os.path.join(label_dir, stem + ext)
            if os.path.exists(cand):
                pairs_f.append(f)
                pairs_l.append(cand)
                break
    return pairs_f, pairs_l


def get_palette(num_classes: int) -> np.ndarray:
    """Deterministic (num_classes, 3) uint8 palette (the reference ships
    hand-picked per-dataset palettes in data_util.py; this generates a
    maximally-spread HSV wheel instead)."""
    import colorsys
    cols = [(0, 0, 0)]
    for i in range(1, num_classes):
        r, g, b = colorsys.hsv_to_rgb((i - 1) / max(num_classes - 1, 1),
                                      0.85, 0.95)
        cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return np.asarray(cols, np.uint8)


def colorize_mask(mask: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8 (reference utils.colorize_mask)."""
    mask = np.asarray(mask, np.int64)
    safe = np.clip(mask, 0, len(palette) - 1)
    return palette[safe]


def save_predictions(preds, out_dir: str, num_classes: int, names=None):
    """Write raw + colorized prediction PNGs (reference
    pixel_classifier.save_predictions)."""
    import os
    from PIL import Image
    os.makedirs(os.path.join(out_dir, 'predictions'), exist_ok=True)
    os.makedirs(os.path.join(out_dir, 'visualizations'), exist_ok=True)
    palette = get_palette(num_classes)
    paths = []
    for i, pred in enumerate(preds):
        name = names[i] if names else f'pred_{i}'
        p = np.asarray(pred, np.uint8)
        Image.fromarray(p).save(
            os.path.join(out_dir, 'predictions', f'{name}.png'))
        Image.fromarray(colorize_mask(p, palette)).save(
            os.path.join(out_dir, 'visualizations', f'{name}.png'))
        paths.append(name)
    return paths


def load_label(path: str, size) -> np.ndarray:
    if path.endswith('.npy'):
        lab = np.load(path)
    else:
        from PIL import Image
        lab = np.asarray(Image.open(path))
        if lab.ndim == 3:
            lab = lab[..., 0]
    if lab.shape != tuple(size):
        from PIL import Image
        lab = np.asarray(Image.fromarray(lab.astype(np.uint8)).resize(
            (size[1], size[0]), Image.NEAREST))
    return lab.astype(np.int32)
