"""Feature post-processing: the TPU-native equivalent of the reference's
``FeatureStore.store`` filter pipeline (feature/components/feature_extractor.py:31-77).

In the reference this runs eagerly per-tap on GPU tensors; here it is a pure
function applied *inside* the jitted extraction step, so reshapes/pools fuse
into the surrounding graph.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .taps import is_filtered_id


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch.nn.functional.adaptive_avg_pool2d for NCHW inputs.

    The reference always calls it with ``target = in_size // resize_ratio``
    (feature_extractor.py:51-53); when the input divides evenly this is plain
    average pooling, which is the fast path XLA tiles well.  The general case
    (uneven bins, same semantics as torch) is handled via bincount-style
    segment means.
    """
    b, c, h, w = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        x = x.reshape(b, c, oh, kh, ow, kw)
        return x.mean(axis=(3, 5))
    # General adaptive pooling: bin i covers [floor(i*H/oh), ceil((i+1)*H/oh)).
    def pool_axis(arr, size, out, axis):
        starts = [int(math.floor(i * size / out)) for i in range(out)]
        ends = [int(math.ceil((i + 1) * size / out)) for i in range(out)]
        segs = [
            jnp.mean(
                jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis, keepdims=True
            )
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(segs, axis=axis)

    x = pool_axis(x, h, oh, axis=2)
    x = pool_axis(x, w, ow, axis=3)
    return x


def tokens_to_map(feat: jnp.ndarray) -> jnp.ndarray:
    """(B, S, C) -> (B, C, sqrt(S), sqrt(S)); assumes square token maps like
    the reference (feature_extractor.py:46-48)."""
    b, s, c = feat.shape
    size = int(math.sqrt(s))
    return feat.reshape(b, size, size, c).transpose(0, 3, 1, 2)


def postprocess_feature(
    feat: jnp.ndarray,
    *,
    resize_ratio: int = 1,
    out_dtype: Optional[jnp.dtype] = jnp.bfloat16,
) -> jnp.ndarray:
    """The store() filter pipeline as a pure function.

    Order matches the reference exactly (feature_extractor.py:41-66):
      1. 3-D token tensors reshaped to B,C,h,w (square maps assumed)
      2. adaptive average pool by ``resize_ratio``
      3. TF.normalize(mean=0, std=1) — an *identity* op as written in the
         reference (subtract 0, divide by 1); reproduced faithfully by doing
         nothing.
      4. dtype cast (reference: fp16 on CUDA; here bf16 is the TPU-native
         narrow type; pass ``out_dtype=None`` for train_unet mode where
         features must stay differentiable at the compute dtype).

    4-D attention score maps (B,H,Sq,Sk) pass through the reshape untouched,
    as in the reference (the len==3 check at feature_extractor.py:46).
    """
    if feat.ndim == 3:
        feat = tokens_to_map(feat)
    if resize_ratio > 1 and feat.ndim == 4:
        target = (feat.shape[2] // resize_ratio, feat.shape[3] // resize_ratio)
        feat = adaptive_avg_pool2d(feat, target)
    # normalize step intentionally omitted: identity (see docstring)
    if out_dtype is not None:
        feat = feat.astype(out_dtype)
    return feat


def postprocess_taps(
    taps: Dict[str, jnp.ndarray],
    *,
    resize_ratio: int = 1,
    out_dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Apply the store pipeline to every captured tap; drops filtered ids
    defensively (cross-k/cross-v, feature_extractor.py:38-39)."""
    out = {}
    for tap_id, feat in taps.items():
        if is_filtered_id(tap_id):
            continue
        if isinstance(feat, tuple):
            out[tap_id] = tuple(
                postprocess_feature(f, resize_ratio=resize_ratio, out_dtype=out_dtype)
                for f in feat
            )
        else:
            out[tap_id] = postprocess_feature(
                feat, resize_ratio=resize_ratio, out_dtype=out_dtype
            )
    return out


def select_background_encounters(taps: Dict[str, tuple], store_idx) -> Dict[str, dict]:
    """Background-extraction filtering: keep only the encounters whose 1-based
    index is in ``store_idx`` (reference feature_extractor.py:68-76; driven by
    generate_with_extraction.py:33).

    Returns {layer: {'feat': {idx: tensor}, 'count': n}} exactly like the
    reference's stored entry shape.
    """
    store_idx = set(store_idx)
    out = {}
    for tap_id, feats in taps.items():
        if not isinstance(feats, tuple):
            feats = (feats,)
        entry = {'feat': {}, 'count': len(feats)}
        for i, f in enumerate(feats, start=1):
            if i in store_idx:
                entry['feat'][i] = f
        out[tap_id] = entry
    return out
