"""Host-side image preprocessing.

Reproduces the reference's input path: PIL resize to (img_size, img_size) +
RGB convert (diffusion_feature.py:118 ``_preprocess_basic``), then the
diffusers ``VaeImageProcessor.preprocess`` normalization to [-1, 1]; tensor
inputs are bilinearly resized (diffusion_feature.py:357-366).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..ops.resize import interpolate_bilinear_nchw


def preprocess_pil_batch(images: Sequence, img_size: int) -> np.ndarray:
    """PIL images -> (B, 3, H, W) float32 in [-1, 1]."""
    out = []
    for im in images:
        im = im.resize((img_size, img_size)).convert('RGB')
        arr = np.asarray(im, dtype=np.float32) / 255.0
        arr = arr * 2.0 - 1.0
        out.append(arr.transpose(2, 0, 1))
    return np.stack(out, axis=0)


def resize_tensor_batch(x, img_size: int):
    """(B, 3, H, W) tensors (already normalized) -> bilinear resize to
    img_size² (torch F.interpolate semantics)."""
    x = np.asarray(x, dtype=np.float32)
    if x.shape[-1] == img_size and x.shape[-2] == img_size:
        return x
    return np.asarray(interpolate_bilinear_nchw(x, (img_size, img_size)))


def postprocess_to_pil(x) -> List:
    """(B, 3, H, W) in [-1,1] -> PIL images (reference
    restore_from_tensor_to_image, diffusion_feature.py:141-142)."""
    from PIL import Image
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x / 2 + 0.5, 0, 1)
    x = (x * 255).round().astype(np.uint8).transpose(0, 2, 3, 1)
    return [Image.fromarray(a) for a in x]
