#!/usr/bin/env python
"""Full-label segmentation trainer (ADE20K / Cityscapes style).

Replaces the reference's mmengine Runner + mmseg plugin
(segmentation/train.py + models/diffusion_segmentor.py) with a native
optax loop: AdamW lr=1.6e-4 wd=0.001, PolyLR power=0.9 eta_min=1e-4 over
80k iters, val mIoU every ``--val_every`` (reference
_base_/schedules/schedule_80k.py), checkpoints as pickled pytrees.

Data: directories of images + integer label maps matched by stem.  Inputs
normalize to [-1, 1] via mean/std 127.5 (reference ade_sdxl.py:8-15) and
random-crop to ``--crop_size`` for training; evaluation uses sliding-window
inference at the same crop size.

Config: a Python-free JSON with the reference config's content:
{"diffusion_feature": {...}, "feature_layers": [[["layer", C], ...], ...],
 "num_classes": 150, "prompt": "...", "pool_scales": [1, 2], ...}
(example values: segmentation/configs/ade_sdxl.py:17-66).
"""

import argparse
import glob
import json
import os
import pickle
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from diffusion_feature_tpu.tasks.segmentation import DiffusionSegmentor  # noqa: E402
from diffusion_feature_tpu.tasks.scarce import compute_iou  # noqa: E402


def list_pairs(img_dir, label_dir):
    imgs = sorted(p for p in glob.glob(os.path.join(img_dir, '*'))
                  if os.path.splitext(p)[1].lower() in
                  ('.jpg', '.jpeg', '.png', '.bmp'))
    pairs = []
    for p in imgs:
        stem = os.path.splitext(os.path.basename(p))[0]
        for ext in ('.png', '.npy'):
            lp = os.path.join(label_dir, stem + ext)
            if os.path.exists(lp):
                pairs.append((p, lp))
                break
    return pairs


def _photometric(img: np.ndarray, rng: random.Random) -> np.ndarray:
    """PhotoMetricDistortion essentials (mmseg defaults): random
    brightness +-32 and contrast 0.5-1.5, each with p=0.5, on uint8."""
    img = img.astype(np.float32)
    if rng.random() < 0.5:
        img = img + rng.uniform(-32, 32)
    if rng.random() < 0.5:
        img = img * rng.uniform(0.5, 1.5)
    return np.clip(img, 0, 255)


def load_pair(img_path, label_path, crop, rng: random.Random,
              train: bool = True, reduce_zero_label: bool = False):
    from PIL import Image
    pil = Image.open(img_path).convert('RGB')
    if label_path.endswith('.npy'):
        lab = np.load(label_path)
    else:
        lab = np.asarray(Image.open(label_path))
        if lab.ndim == 3:
            lab = lab[..., 0]
    lab = lab.astype(np.int32)
    if reduce_zero_label:
        # ADE20K: 0 = unlabeled -> 255; classes 1..N -> 0..N-1
        lab = np.where(lab == 0, 255, lab - 1)
    ch, cw = crop
    if train:
        # RandomResize ratio 0.5-2.0 + RandomFlip 0.5 (reference ADE20K
        # train pipeline, _base_/datasets/ade20k.py)
        scale = rng.uniform(0.5, 2.0)
        nw = max(cw, int(round(pil.width * scale)))
        nh = max(ch, int(round(pil.height * scale)))
        pil = pil.resize((nw, nh), Image.BILINEAR)
        lab = np.asarray(Image.fromarray(lab.astype(np.uint16)).resize(
            (nw, nh), Image.NEAREST), dtype=np.int32)
        if rng.random() < 0.5:
            pil = pil.transpose(Image.FLIP_LEFT_RIGHT)
            lab = lab[:, ::-1]
    img = np.asarray(pil)
    if train:
        img = _photometric(img, rng)
    H, W = img.shape[:2]
    if H < ch or W < cw:
        pad_h, pad_w = max(0, ch - H), max(0, cw - W)
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        lab = np.pad(lab, ((0, pad_h), (0, pad_w)), constant_values=255)
        H, W = img.shape[:2]
    if train:
        # random crop for training; evaluation keeps the FULL image so
        # sliding-window inference covers it all (mmseg semantics)
        y = rng.randrange(H - ch + 1)
        x = rng.randrange(W - cw + 1)
        img = img[y:y + ch, x:x + cw]
        lab = lab[y:y + ch, x:x + cw]
    # normalize to [-1, 1] (reference mean/std 127.5)
    img = (img.astype(np.float32) - 127.5) / 127.5
    return np.ascontiguousarray(img.transpose(2, 0, 1)), lab.astype(np.int32)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--train_img_dir', type=str, required=True)
    parser.add_argument('--train_label_dir', type=str, required=True)
    parser.add_argument('--val_img_dir', type=str, default=None)
    parser.add_argument('--val_label_dir', type=str, default=None)
    parser.add_argument('--work_dir', type=str, default='./seg_out')
    parser.add_argument('--max_iters', type=int, default=80000)
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--crop_size', type=int, default=None,
                        help='train/slide crop; defaults to the config\'s '
                             'crop_size (reference per-config crop, e.g. '
                             '1024 for city_*), else 512')
    parser.add_argument('--lr', type=float, default=1.6e-4)
    parser.add_argument('--weight_decay', type=float, default=0.001)
    parser.add_argument('--val_every', type=int, default=8000)
    parser.add_argument('--weights', type=str, default=None)
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--dp', type=int, default=1,
                        help='data-parallel devices: batch shards over a '
                             "'dp' mesh (replaces the reference's mmengine "
                             'NCCL launcher, SURVEY §2.12)')
    parser.add_argument('--eval_only', action='store_true',
                        help='skip training: evaluate --resume checkpoint '
                             'on the val set (mmseg test.py role)')
    parser.add_argument('--reduce_zero_label', action='store_true',
                        help='ADE20K-style labels: 0=background becomes '
                             'ignore (255), classes shift down by one '
                             "(reference _base_/datasets/ade20k.py)")
    args = parser.parse_args(argv)

    os.makedirs(args.work_dir, exist_ok=True)
    with open(args.config) as f:
        cfg = json.load(f)
    if args.crop_size is None:
        args.crop_size = int(cfg.get('crop_size', [512, 512])[0])
    # stride > crop would leave uncovered bands in slide_inference
    # (0-count pixels -> 0/0 logits); clamp to the effective crop
    slide_stride = tuple(min(int(s), args.crop_size)
                         for s in cfg.get('stride', [512, 512]))
    if isinstance(cfg['diffusion_feature'], list):   # multi-model ensemble
        feature_layers = [[[(lid, int(c)) for lid, c in lvl] for lvl in mfl]
                          for mfl in cfg['feature_layers']]
    else:
        feature_layers = [[(lid, int(c)) for lid, c in lvl]
                          for lvl in cfg['feature_layers']]
    seg = DiffusionSegmentor(
        diffusion_feature=cfg['diffusion_feature'],
        feature_layers=feature_layers,
        num_classes=cfg.get('num_classes', 150),
        head_channels=cfg.get('head_channels', 512),
        pool_scales=cfg.get('pool_scales', (1, 2)),
        prompt=cfg.get('prompt', ''),
        prompt_tuning=cfg.get('prompt_tuning', False),
        weights=args.weights, seed=args.seed)

    params, batch_stats = seg.init_state()
    # PolyLR power=0.9, eta_min=1e-4 (schedule_80k.py:6-13)
    sched = optax.polynomial_schedule(
        init_value=args.lr, end_value=1e-4, power=0.9,
        transition_steps=args.max_iters)
    opt = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = opt.init(params)
    start = 0
    if args.resume:
        with open(args.resume, 'rb') as f:
            ck = pickle.load(f)
        params, batch_stats, opt_state, start = (
            ck['params'], ck['batch_stats'], ck['opt_state'], ck['iter'])

    train_pairs = list_pairs(args.train_img_dir, args.train_label_dir)
    val_pairs = (list_pairs(args.val_img_dir, args.val_label_dir)
                 if args.val_img_dir else [])
    print(f'{len(train_pairs)} train / {len(val_pairs)} val pairs')

    if args.eval_only:
        assert val_pairs, 'eval_only needs --val_img_dir/--val_label_dir'
        assert args.resume, ('--eval_only without --resume would score '
                             'randomly initialized weights')
        rng0 = random.Random(args.seed)
        crop0 = (args.crop_size, args.crop_size)
        preds, gts = [], []
        for ip, lp in val_pairs:
            img, lab = load_pair(ip, lp, crop0, rng0, train=False,
                                 reduce_zero_label=args.reduce_zero_label)
            pred = seg.predict(params, batch_stats,
                               jnp.asarray(img)[None], mode='slide',
                               crop_size=crop0, stride=slide_stride)
            preds.append(pred[0])
            gts.append(lab)
        _, miou = compute_iou(preds, gts, seg.head.num_classes,
                              ignore_label=255)
        print(f'eval mIoU: {miou:.4f}')
        return
    assert train_pairs, 'no training pairs found'

    if seg.prompt_tuning:
        # gradients flow through the extraction step: eager composition of
        # the facade's jitted program + head (jitting the grad would retrace
        # the extractor)
        def train_step(params, batch_stats, opt_state, images, labels, dk):
            def lf(p, bs):
                return seg.loss(p, bs, images, labels, dk)
            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                lf, has_aux=True)(params, batch_stats)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss, parts
    else:
        # frozen extractor: features come from the facade's cached program;
        # the head fwd/bwd + AdamW compile into ONE jitted step (eager
        # per-op dispatch costs ~25-30 ms each over the axon tunnel)
        @jax.jit
        def _head_step(params, batch_stats, opt_state, feats, labels, dk):
            def lf(p, bs):
                return seg.head_loss(p, bs, feats, labels, dk)
            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                lf, has_aux=True)(params, batch_stats)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss, parts

        def train_step(params, batch_stats, opt_state, images, labels, dk):
            feats = seg.extract_features(images, is_test=False)
            return _head_step(params, batch_stats, opt_state, feats,
                              labels, dk)

    rng = random.Random(args.seed)
    key = jax.random.PRNGKey(args.seed)
    crop = (args.crop_size, args.crop_size)

    batch_sh = repl = None
    if args.dp > 1:
        from diffusion_feature_tpu.parallel.mesh import (
            make_mesh, batch_sharding, replicated)
        assert args.batch_size % args.dp == 0, 'batch_size must divide dp'
        mesh = make_mesh(dp=args.dp, tp=1, devices=jax.devices()[:args.dp])
        batch_sh, repl = batch_sharding(mesh), replicated(mesh)
        params = jax.device_put(params, jax.tree.map(lambda _: repl, params))
        batch_stats = jax.device_put(
            batch_stats, jax.tree.map(lambda _: repl, batch_stats))

    for it in range(start, args.max_iters):
        batch = [load_pair(*train_pairs[rng.randrange(len(train_pairs))],
                           crop, rng,
                           reduce_zero_label=args.reduce_zero_label)
                 for _ in range(args.batch_size)]
        images = jnp.asarray(np.stack([b[0] for b in batch]))
        labels = jnp.asarray(np.stack([b[1] for b in batch]))
        if batch_sh is not None:
            images = jax.device_put(images, batch_sh)
            labels = jax.device_put(labels, batch_sh)
        key, dk = jax.random.split(key)
        params, batch_stats, opt_state, loss, parts = train_step(
            params, batch_stats, opt_state, images, labels, dk)
        if it % 50 == 0:
            p = {k: round(float(v), 4) for k, v in parts.items()}
            print(f'iter {it}: loss {float(loss):.4f} {p}')
        if (it + 1) % args.val_every == 0 or it + 1 == args.max_iters:
            if val_pairs:
                preds, gts = [], []
                for ip, lp in val_pairs:
                    img, lab = load_pair(
                        ip, lp, crop, rng, train=False,
                        reduce_zero_label=args.reduce_zero_label)
                    pred = seg.predict(params, batch_stats,
                                       jnp.asarray(img)[None], mode='slide',
                                       crop_size=crop, stride=slide_stride)
                    preds.append(pred[0])
                    gts.append(lab)
                _, miou = compute_iou(preds, gts, seg.head.num_classes,
                                      ignore_label=255)
                print(f'iter {it + 1}: val mIoU {miou:.4f}')
            with open(os.path.join(args.work_dir,
                                   f'iter_{it + 1}.pkl'), 'wb') as f:
                pickle.dump({'iter': it + 1,
                             'params': jax.device_get(params),
                             'batch_stats': jax.device_get(batch_stats),
                             'opt_state': jax.device_get(opt_state)}, f)


if __name__ == '__main__':
    main()
