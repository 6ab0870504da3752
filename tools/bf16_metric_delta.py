#!/usr/bin/env python
"""Serving-dtype (bf16) task-metric deltas (VERDICT r4 item 4).

The frozen-metric fixtures (tests/test_frozen_metrics.py) pin the exact
PCK / CLIP-loss / mIoU floats the task loops produce at fp32 on synthetic
data. This tool re-runs the same pipelines with the extractor at the
PRODUCTION dtype (bfloat16 — the facade default; the reference serves
fp16, /root/reference/extract_feature.py:24) and reports metric deltas
vs fp32, quantifying what the serving dtype costs downstream where it
matters: in the task metric, not the per-tap rel-err.

Runs on the CPU mesh (tiny test-sd twin; same fixtures as the frozen
tests). Usage: python tools/bf16_metric_delta.py
"""

import json
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pck(dtype, n_points=64):
    """PCK over a dense 8x8 keypoint grid (a 5-point set makes the delta
    pure NN-argmax-flip noise: one flipped match moves PCK by 0.2).
    Returns (pck, aggregated feature map) so the caller can also report
    bf16-vs-fp32 feature cosine — the fidelity signal underneath the
    argmax."""
    import jax
    from PIL import Image
    from diffusion_feature_tpu.tasks.correspondence import (
        AggregationNetwork, compute_pck, find_nn_source_correspondences)
    net = AggregationNetwork(
        configs=[{'layer': {'up-level1-repeat0-res-out': True},
                  'version': 'test-sd', 'img_size': 64, 't': 5,
                  'feature_len': 32, 'dtype': dtype}],
        output_size=(32, 32), seed=0)
    params = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    arr = (rng.rand(64, 64, 3) * 255).astype('uint8')
    img1 = Image.fromarray(arr)
    img2 = Image.fromarray(np.roll(arr, (8, 8), axis=(0, 1)))
    net.extractors[0]['model']._rng = jax.random.PRNGKey(11)
    f1 = net.apply(params, net.extract(img1))
    net.extractors[0]['model']._rng = jax.random.PRNGKey(11)
    f2 = net.apply(params, net.extract(img2))
    side = int(np.sqrt(n_points))
    g = (np.arange(side) + 0.5) * (64.0 / side)
    src = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    _, pred = find_nn_source_correspondences(
        f1, f2, src, output_size=(32, 32), load_size=(64, 64))
    _, _, v = compute_pck(np.asarray(pred), src, load_size=(64, 64))
    return float(v), np.asarray(f1, np.float32)


def seg_miou(dtype):
    import jax
    import jax.numpy as jnp
    import optax
    from diffusion_feature_tpu.tasks.segmentation import DiffusionSegmentor
    from diffusion_feature_tpu.tasks.scarce import compute_iou
    seg = DiffusionSegmentor(
        diffusion_feature={'layer': {'up-level1-repeat0-res-out': True},
                           'version': 'test-sd', 'img_size': 64,
                           't': 50, 'dtype': dtype},
        feature_layers=[[('up-level1-repeat0-res-out', 32)]],
        num_classes=4, head_channels=16, pool_scales=(1, 2),
        prompt='a scene', seed=0)
    seg.extractor._rng = jax.random.PRNGKey(3)
    params, batch_stats = seg.init_state(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1)
    labels = jnp.asarray(rng.randint(0, 4, (2, 64, 64)), jnp.int32)
    key = jax.random.PRNGKey(1)
    loss = None
    for _ in range(3):
        key, dk = jax.random.split(key)

        def lf(p, bs):
            return seg.head_loss(
                p, bs, seg.extract_features(images, is_test=True),
                labels, dk)
        (loss, (_, batch_stats)), grads = jax.value_and_grad(
            lf, has_aux=True)(params, batch_stats)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    pred = seg.predict(params, batch_stats, images)
    _, miou = compute_iou(list(pred), list(np.asarray(labels)), 4,
                          ignore_label=255)
    return float(loss), float(miou)


def main():
    r32_pck, f32 = pck('float32')
    r16_pck, f16 = pck('bfloat16')
    a, b = f32.ravel(), f16.ravel()
    feat_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    l32, m32 = seg_miou('float32')
    l16, m16 = seg_miou('bfloat16')
    print(json.dumps({
        'pck_fp32': round(r32_pck, 6), 'pck_bf16': round(r16_pck, 6),
        'pck_delta': round(r16_pck - r32_pck, 6),
        'corres_feature_cosine': round(feat_cos, 6),
        'seg_miou_fp32': round(m32, 6), 'seg_miou_bf16': round(m16, 6),
        'seg_miou_delta': round(m16 - m32, 6),
        'seg_loss_fp32': round(l32, 6), 'seg_loss_bf16': round(l16, 6),
    }))


if __name__ == '__main__':
    main()
