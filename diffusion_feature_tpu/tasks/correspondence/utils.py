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


# --------------------------------------------------------------------------
# Dense / unsupervised correspondence extras (reference
# correspondence_utils.py:89-111 find_nn_correspondences, :146-158
# points_to_patches, :230-323 best-buddies, :338-467 cyclical).  The
# reference's task loop never calls these, but they are part of the public
# helper surface; semantics (column conventions, fg masking, k-means
# selection) are preserved.

def find_nn_correspondences(sims: jnp.ndarray):
    """Dense NN matches over a (B, w*h, w*h) similarity matrix
    (reference :89-111).  Returns (points1 (w*h, 2), points2 (B, w*h, 2))
    in (y, x) order; points1 enumerates image1's grid."""
    w = h = int(math.sqrt(sims.shape[-1]))
    b = sims.shape[0]
    yy, xx = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing='ij')
    points1 = jnp.stack([yy, xx], axis=-1).reshape(-1, 2)
    points1 = jnp.broadcast_to(points1[None], (b, w * h, 2))

    points2 = jnp.argmax(sims, axis=-1)
    points2 = jnp.stack([points2 // h, points2 % h], axis=-1)
    return points1.astype(jnp.float32), points2.astype(jnp.float32)


def points_to_patches(source_points: np.ndarray, num_patches: int,
                      load_size) -> np.ndarray:
    """Image-space (y, x) points -> patch-grid coordinates (reference
    :146-158; load_size is (w, h), rounding + boundary clip preserved)."""
    source_points = np.round(np.asarray(source_points, np.float64))
    source_patches_y = (num_patches / load_size[1]) * source_points[:, 0]
    source_patches_x = (num_patches / load_size[0]) * source_points[:, 1]
    patches = np.stack([source_patches_y, source_patches_x], axis=-1)
    return np.round(np.clip(patches, 0, num_patches - 1))


def chunk_cosine_sim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between descriptor sets (B, 1, T, D) -> (B, 1, Tx, Ty)
    (reference chunk_cosine_sim semantics, one chunk per head dim).  Norms
    clamp at torch.nn.CosineSimilarity's eps=1e-8 so an all-zero descriptor
    yields 0 similarity, not NaN."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
    return jnp.einsum('bhtd,bhsd->bhts', xn, yn)


def _kmeans_select(descriptors: np.ndarray, ranks: np.ndarray,
                   n_clusters: int) -> np.ndarray:
    """k-means over normalized descriptors; per cluster keep the
    highest-ranked member (the reference's selection loop, :305-311)."""
    from sklearn.cluster import KMeans
    kmeans = KMeans(n_clusters=n_clusters, random_state=0,
                    n_init=10).fit(descriptors)
    chosen = np.full(n_clusters, -1, np.int64)
    best = np.full(n_clusters, -np.inf)
    for i, (label, rank) in enumerate(zip(kmeans.labels_, ranks)):
        if rank > best[label]:
            best[label] = rank
            chosen[label] = i
    return chosen[chosen >= 0]


def find_best_buddies_correspondences(descriptors1, descriptors2,
                                      saliency_map1, saliency_map2,
                                      num_pairs: int = 10,
                                      thresh: float = 0.05):
    """Mutual-nearest-neighbour ("best buddies") matching with saliency
    fg-masking and k-means diversification (reference :230-323).
    descriptors (B, 1, T, D); saliency (B, T).  Returns (points1, points2)
    in patch-grid (y, x) coordinates."""
    d1 = np.asarray(descriptors1, np.float32)
    d2 = np.asarray(descriptors2, np.float32)
    t = d1.shape[2]
    n = int(np.sqrt(t))
    sal1 = np.asarray(saliency_map1, np.float32)[0]
    sal2 = np.asarray(saliency_map2, np.float32)[0]
    fg1, fg2 = sal1 > thresh, sal2 > thresh

    sims = np.asarray(chunk_cosine_sim(jnp.asarray(d1), jnp.asarray(d2)))[0, 0]
    nn_1 = sims.argmax(axis=-1)          # img1 -> img2
    nn_2 = sims.argmax(axis=-2)          # img2 -> img1
    idxs = np.arange(t)
    bbs_mask = nn_2[nn_1] == idxs

    fg2_new = np.zeros(t, bool)
    fg2_new[nn_2[fg2]] = True
    bbs_mask = bbs_mask & fg1 & fg2_new
    if not bbs_mask.any():
        return np.zeros((0, 2)), np.zeros((0, 2))

    bb_d1 = d1[0, 0, bbs_mask]
    bb_d2 = d2[0, 0, nn_1[bbs_mask]]
    all_desc = np.concatenate([bb_d1, bb_d2], axis=1)
    all_desc = all_desc / np.sqrt((all_desc ** 2).sum(axis=1))[:, None]
    n_clusters = min(num_pairs, len(all_desc))
    ranks = (sal1[bbs_mask] + sal2[nn_1[bbs_mask]]) / 2
    sel = _kmeans_select(all_desc, ranks, n_clusters)

    src = np.nonzero(bbs_mask)[0][sel]
    tgt = nn_1[src]
    points1 = np.stack([src // n, src % n], axis=-1).astype(np.float64)
    points2 = np.stack([tgt // n, tgt % n], axis=-1).astype(np.float64)
    return points1, points2


def find_cyclical_correspondences(descriptors1, descriptors2,
                                  saliency_map1, saliency_map2,
                                  num_pairs: int = 10,
                                  thresh: float = 0.05):
    """Cycle-consistency matching: image1 -> image2 -> image1, keep the
    points with the smallest cycle distance, fg-masked, k-means-diversified
    (reference :338-467).  Returns (points1, points2) patch-grid (y, x)."""
    d1 = np.asarray(descriptors1, np.float32)
    d2 = np.asarray(descriptors2, np.float32)
    t = d1.shape[2]
    n = int(np.sqrt(t))
    sal1 = np.asarray(saliency_map1, np.float32)
    sal2 = np.asarray(saliency_map2, np.float32)
    fg1, fg2 = sal1 > thresh, sal2 > thresh

    sims = np.asarray(chunk_cosine_sim(jnp.asarray(d1), jnp.asarray(d2)))
    sim_1 = sims.max(axis=-1)[:, 0]      # (B, T)
    nn_1 = sims.argmax(axis=-1)[:, 0]
    nn_2 = sims.argmax(axis=-2)[:, 0]

    # bg points in image2 map to 0 (reference's top-left sentinel, :391)
    nn_2 = np.where(fg2, nn_2, 0)
    cyc = np.take_along_axis(nn_2, nn_1, axis=-1)     # nn_2[nn_1]

    cyc_ij = np.stack([cyc // n, cyc % n], axis=-1).astype(np.float64)
    img_ij = np.stack([np.arange(t) // n, np.arange(t) % n], axis=-1)
    img_ij = np.broadcast_to(img_ij, cyc_ij.shape).astype(np.float64)
    cyc_ij = np.where(cyc_ij == 0, float(t), cyc_ij)  # sentinel -> far away

    dists = -np.linalg.norm(cyc_ij - img_ij, axis=-1)            # (B, T)
    dn = dists - dists.min(axis=1, keepdims=True)
    dn = dn / np.maximum(dn.max(axis=1, keepdims=True), 1e-12)
    dn = dn * fg1.astype(np.float64)

    topk = np.argsort(-dn, axis=-1)[:, :num_pairs * 2]
    b = d1.shape[0]
    sel1 = []
    for bi in range(b):
        idxs_b = topk[bi]
        feats = d1[bi, 0][idxs_b]
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=min(num_pairs, len(feats)), random_state=0,
                    n_init=10).fit(feats)
        chosen = []
        for kk in range(km.n_clusters):
            members = np.where(km.labels_ == kk)[0]
            best = members[sal1[bi][idxs_b[members]].argmax()]
            chosen.append(idxs_b[best])
        sel1.append(np.asarray(chosen))
    sel1 = np.stack(sel1)
    sel2 = np.take_along_axis(nn_1, sel1, axis=-1)

    points1 = np.stack([sel1[0] // n, sel1[0] % n], axis=-1).astype(np.float64)
    points2 = np.stack([sel2[0] // n, sel2[0] % n], axis=-1).astype(np.float64)
    return points1, points2
