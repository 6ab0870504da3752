#!/usr/bin/env python
"""Label-scarce pixel classification over dumped diffusion features.

Mirrors the reference's scarce_segmentation/task-pixel.py: load pre-dumped
aggregated features (one .npy per image, from extract_feature.py
--aggregate_output), bilinearly resize to the dataset's working resolution,
flatten to per-pixel rows, train an ensemble of MLP classifiers with early
stopping, evaluate with majority vote + JS uncertainty and per-class
IoU -> mIoU.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402

from diffusion_feature_tpu.tasks.scarce import (  # noqa: E402
    compute_iou, get_dataset_setting, predict_labels, shuffle_split,
    train_ensemble,
)
from diffusion_feature_tpu.tasks.scarce.data import (  # noqa: E402
    list_feature_label_pairs, load_label,
)
from diffusion_feature_tpu.ops.resize import interpolate_bilinear_nchw  # noqa: E402


def _to_rows(feat: np.ndarray, size) -> np.ndarray:
    """(C, H, W) array -> (H*W, C) rows at the working resolution."""
    feat = feat.astype(np.float32)
    if feat.ndim == 4:
        feat = feat[0]
    f = interpolate_bilinear_nchw(jnp.asarray(feat)[None], tuple(size))[0]
    f = np.asarray(f)
    return f.reshape(f.shape[0], -1).T


def load_feature(path: str, size) -> np.ndarray:
    """(C, H, W) .npy -> (H*W, C) rows at the working resolution."""
    return _to_rows(np.load(path), size)


def load_features(paths, size):
    """Prefetch all dumps through the native reader pool (npyio.cpp): file
    IO overlaps with the resize/flatten compute of the previous file."""
    from diffusion_feature_tpu.native import AsyncNpyReader
    reader = AsyncNpyReader(n_threads=4)
    try:
        for feat in reader.read_all(paths):
            yield _to_rows(feat, size)
    finally:
        reader.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--category', type=str, default='horse_21')
    parser.add_argument('--feature_dir', type=str, required=True)
    parser.add_argument('--label_dir', type=str, required=True)
    parser.add_argument('--exp_dir', type=str, default='./pixel_out')
    parser.add_argument('--train_num', type=int, default=30)
    parser.add_argument('--model_num', type=int, default=None)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--max_epochs', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    setting = get_dataset_setting(args.category)
    if args.model_num is not None:
        setting['model_num'] = args.model_num
    size = setting['dim'][:2]
    ncls = setting['number_class']
    os.makedirs(args.exp_dir, exist_ok=True)

    feats, labels = list_feature_label_pairs(args.feature_dir, args.label_dir)
    if not feats:
        print('no feature/label pairs found', file=sys.stderr)
        sys.exit(1)
    tr_f, tr_l, te_f, te_l = shuffle_split(feats, labels, args.train_num,
                                           seed=args.seed)
    print(f'{len(tr_f)} train / {len(te_f)} test images')

    # build the pixel matrix lazily: skipped entirely when every ensemble
    # member checkpoint already exists
    X = y = None

    def training_matrix():
        nonlocal X, y
        if X is None:
            X = np.concatenate(list(load_features(tr_f, size)))
            y = np.concatenate([load_label(l, size).ravel() for l in tr_l])
            keep = y != setting['ignore_label']
            X, y = X[keep], y[keep]
            print(f'{len(X)} training pixels, dim {X.shape[1]}')
        return X, y

    # train (skipping already-trained members, reference :173-178)
    ensemble = []
    for i in range(setting['model_num']):
        ckpt = os.path.join(args.exp_dir, f'model_{i}.pkl')
        if os.path.exists(ckpt):
            with open(ckpt, 'rb') as f:
                ensemble.append(pickle.load(f))
            print(f'model {i}: loaded existing checkpoint')
            continue
        X, y = training_matrix()
        from diffusion_feature_tpu.tasks.scarce.pixel_classifier import train_one
        member = train_one(X, y, ncls, seed=args.seed * 1000 + i,
                           batch_size=args.batch_size,
                           max_epochs=args.max_epochs)
        with open(ckpt, 'wb') as f:
            pickle.dump(member, f)
        ensemble.append(member)
        print(f'model {i}: trained + saved')

    # evaluate (features prefetched by the native reader pool)
    preds, gts, uncertainties = [], [], []
    for rows_np, l in zip(load_features(te_f, size), te_l):
        rows = jnp.asarray(rows_np)
        pred, u = predict_labels(ensemble, rows, tuple(size), ncls)
        preds.append(pred)
        gts.append(load_label(l, size))
        uncertainties.append(u)
    from diffusion_feature_tpu.tasks.scarce.data import save_predictions
    names = [os.path.splitext(os.path.basename(f))[0] for f in te_f]
    save_predictions(preds, args.exp_dir, args.category, names)
    ious, miou = compute_iou(preds, gts, ncls,
                             ignore_label=setting['ignore_label'])
    print('per-class IoU:', {k: round(v, 4) for k, v in ious.items()})
    print('Overall mIoU:', round(miou, 4))
    print('Mean uncertainty:', round(float(np.mean(uncertainties)), 4))


if __name__ == '__main__':
    main()
