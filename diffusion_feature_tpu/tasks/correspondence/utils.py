"""Semantic-correspondence helpers: cosine-similarity nearest neighbour and
PCK@k — JAX port of the reference's numerics
(correspondence/correspondence/correspondence_utils.py).

Conventions preserved exactly: points are (y, x); image sizes are (w, h);
``points_to_idxs`` flattens with ``load_size[1] * round(y) + round(x)``
(:144-150); PCK thresholds by max image side or bbox side (:160-167).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def rescale_points(points: np.ndarray, old_shape, new_shape) -> np.ndarray:
    """(y, x) points; shapes are (w, h) (reference :23-29)."""
    x_scale = new_shape[0] / old_shape[0]
    y_scale = new_shape[1] / old_shape[1]
    return np.multiply(points, np.array([y_scale, x_scale]))


def points_to_idxs(points: np.ndarray, load_size) -> np.ndarray:
    points_y = np.clip(points[:, 0], 0, load_size[1] - 1)
    points_x = np.clip(points[:, 1], 0, load_size[0] - 1)
    return load_size[1] * np.round(points_y) + np.round(points_x)


def flatten_feats(feats: jnp.ndarray) -> jnp.ndarray:
    """(b, c, w, h) -> (b, w*h, c)."""
    b, c, w, h = feats.shape
    return feats.reshape(b, c, w * h).transpose(0, 2, 1)


def normalize_feats(feats: jnp.ndarray) -> jnp.ndarray:
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def batch_cosine_sim(img1_feats: jnp.ndarray, img2_feats: jnp.ndarray,
                     flatten: bool = True, normalize: bool = True) -> jnp.ndarray:
    if flatten:
        img1_feats = flatten_feats(img1_feats)
        img2_feats = flatten_feats(img2_feats)
    if normalize:
        img1_feats = normalize_feats(img1_feats)
        img2_feats = normalize_feats(img2_feats)
    return jnp.matmul(img1_feats, img2_feats.transpose(0, 2, 1))


def find_nn_source_correspondences(img1_feats, img2_feats, source_points,
                                   output_size, load_size):
    """Nearest-neighbour matches of the annotated source points
    (reference :117-141): features bilinearly upsampled to load_size, source
    rows gathered, argmax over target positions."""
    def up(f):
        b, c = f.shape[:2]
        return jax.image.resize(f, (b, c) + tuple(load_size), method='bilinear')

    img1_feats = up(img1_feats)
    img2_feats = up(img2_feats)
    source_idx = jnp.asarray(points_to_idxs(np.asarray(source_points),
                                            load_size), jnp.int32)
    f1 = flatten_feats(img1_feats)[:, source_idx, :]
    f2 = flatten_feats(img2_feats)
    sims = jnp.matmul(normalize_feats(f1),
                      normalize_feats(f2).transpose(0, 2, 1))

    num_pixels = int(math.sqrt(sims.shape[-1]))
    points2 = jnp.argmax(sims, axis=-1)
    points2 = jnp.stack([points2 // num_pixels, points2 % num_pixels], axis=-1)
    return jnp.asarray(source_points), points2[0]


def compute_pck(predicted_points: np.ndarray, target_points: np.ndarray,
                load_size, pck_threshold: float = 0.1,
                target_bounding_box=None) -> Tuple[np.ndarray, np.ndarray, float]:
    distances = np.linalg.norm(predicted_points - target_points, axis=-1)
    if target_bounding_box is None:
        pck = distances <= pck_threshold * max(load_size)
    else:
        left, top, right, bottom = target_bounding_box
        pck = distances <= pck_threshold * max(right - left, bottom - top)
    return distances, pck, pck.sum() / len(pck)


def draw_correspondences(source_points, predicted_points, img1, img2,
                         out_path: str, radius: int = 4, title: str = ''):
    """Side-by-side visualization of source points and their predicted
    matches (reference correspondence_utils.py:172-213; PIL instead of
    matplotlib).  Points are (y, x)."""
    from PIL import Image, ImageDraw

    img1 = img1.convert('RGB')
    img2 = img2.convert('RGB')
    h = max(img1.height, img2.height)
    canvas = Image.new('RGB', (img1.width + img2.width, h + 16), 'white')
    canvas.paste(img1, (0, 16))
    canvas.paste(img2, (img1.width, 16))
    draw = ImageDraw.Draw(canvas)
    if title:
        draw.text((4, 2), title, fill='black')
    n = len(source_points)
    for i, (sp, tp) in enumerate(zip(np.asarray(source_points),
                                     np.asarray(predicted_points))):
        hue = int(360 * i / max(n, 1))
        color = f'hsl({hue}, 90%, 45%)'
        y1, x1 = float(sp[0]) + 16, float(sp[1])
        y2, x2 = float(tp[0]) + 16, float(tp[1]) + img1.width
        draw.ellipse([x1 - radius, y1 - radius, x1 + radius, y1 + radius],
                     outline=color, width=2)
        draw.ellipse([x2 - radius, y2 - radius, x2 + radius, y2 + radius],
                     outline=color, width=2)
    canvas.save(out_path)
    return out_path


def load_annotation(ann: dict, load_size, image_path: str = ''):
    """SPair annotation -> (source_points, target_points, src_path, tgt_path,
    category), points flipped to (y, x) and rescaled to load_size
    (reference load_image_pair, :21-49).  Records source/target_size on the
    annotation in place, like the reference."""
    import os
    from PIL import Image
    src = Image.open(os.path.join(image_path, ann['source_path'])).convert('RGB')
    tgt = Image.open(os.path.join(image_path, ann['target_path'])).convert('RGB')
    ann['source_size'] = src.size
    ann['target_size'] = tgt.size
    source_points = np.flip(np.asarray(ann['source_points'], np.float64), 1)
    target_points = np.flip(np.asarray(ann['target_points'], np.float64), 1)
    source_points = rescale_points(source_points, src.size, load_size)
    target_points = rescale_points(target_points, tgt.size, load_size)
    return (source_points, target_points, ann['source_path'],
            ann['target_path'], ann['category'])
