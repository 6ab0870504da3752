#!/usr/bin/env python
"""SPair-71k semantic correspondence: train the aggregation head with a
CLIP-style symmetric cross-entropy over cosine similarities, validate with
PCK@0.1 (image- and bbox-relative).

Mirrors the reference's task-corres.py flow: per annotation pair, extract
frozen diffusion features for both images, compute bidirectional CE between
annotated source/target point correspondences (:70-80), AdamW(5e-4, wd 0.01)
on the aggregation conv (logit_scale stays fixed, reference :25), validation
every 500 steps (:94-141), checkpoints with {step, config, params,
opt_state} (:83-91).
"""

import argparse
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

from diffusion_feature_tpu.tasks.correspondence import (  # noqa: E402
    AggregationNetwork, batch_cosine_sim, compute_pck,
    find_nn_source_correspondences, load_annotation, points_to_idxs,
    rescale_points,
)

OUTPUT_SIZE = (128, 128)   # reference get_rescale_size: (128,128), (512,512)
LOAD_SIZE = (512, 512)


def clip_loss(params, net, f_src, f_tgt, source_idx, target_idx):
    """Bidirectional CLIP CE (reference compute_clip_loss :70-80);
    ``source_idx``/``target_idx`` are precomputed flat point indices
    (points_to_idxs) so the loss jits cleanly."""
    img1 = net.apply(params, f_src)
    img2 = net.apply(params, f_tgt)
    # fixed CLIP temperature (reference keeps it out of the optimizer)
    scale = jnp.exp(jnp.float32(net.logit_scale))
    source_logits = scale * batch_cosine_sim(img1, img2)
    target_logits = scale * batch_cosine_sim(img2, img1)
    ls = optax.softmax_cross_entropy_with_integer_labels(
        source_logits[0, source_idx], target_idx).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(
        target_logits[0, target_idx], source_idx).mean()
    return (ls + lt) / 2


def validate(net, params, val_anns, image_path):
    pck_img_all, pck_bbox_all = [], []
    for ann in val_anns:
        sp, tp, src, tgt, _ = load_annotation(ann, LOAD_SIZE, image_path)
        f_src = net.apply(params, net.extract(os.path.join(image_path, src)))
        f_tgt = net.apply(params, net.extract(os.path.join(image_path, tgt)))
        _, pred = find_nn_source_correspondences(f_src, f_tgt, sp,
                                                 OUTPUT_SIZE, LOAD_SIZE)
        pred = np.asarray(pred, np.float64)
        target_size = ann['target_size']
        pred = rescale_points(pred, LOAD_SIZE, target_size)
        tp_orig = rescale_points(tp, LOAD_SIZE, target_size)
        _, pck_img, _ = compute_pck(pred, tp_orig, target_size)
        _, pck_bbox, _ = compute_pck(pred, tp_orig, target_size,
                                     target_bounding_box=ann.get(
                                         'target_bounding_box'))
        pck_img_all.append(pck_img)
        pck_bbox_all.append(pck_bbox)
    pck_img = np.concatenate(pck_img_all)
    pck_bbox = np.concatenate(pck_bbox_all)
    return float(pck_img.mean()), float(pck_bbox.mean())


def save_checkpoint(path, step, config, params, opt_state):
    with open(path, 'wb') as f:
        pickle.dump({'step': step, 'config': config,
                     'params': jax.device_get(params),
                     'opt_state': jax.device_get(opt_state)}, f)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True,
                        help='task config json: list of extractor configs '
                             "({feature_len, layer, version, attention, "
                             "img_size, t})")
    parser.add_argument('--train_anns', type=str, required=True)
    parser.add_argument('--val_anns', type=str, required=True)
    parser.add_argument('--dataset_path', type=str, default='')
    parser.add_argument('--task_path', type=str, default='./corres_out')
    parser.add_argument('--lr', type=float, default=5e-4)
    parser.add_argument('--max_steps', type=int, default=5000)
    parser.add_argument('--val_every', type=int, default=500)
    parser.add_argument('--weights', type=str, default=None)
    parser.add_argument('--load_weight', type=str, default=None)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    os.makedirs(args.task_path, exist_ok=True)
    # print + flat-file logger (reference task-corres.py:26-31)
    logf = open(os.path.join(args.task_path, 'log.txt'), 'a')

    def log(s):
        print(s)
        logf.write(s + '\n')
        logf.flush()

    with open(args.config) as f:
        configs = json.load(f)
    if isinstance(configs, dict):
        configs = [configs]

    net = AggregationNetwork(configs, weights=args.weights, seed=args.seed)
    params = net.init_params()
    # reference task-corres.py optimizer: AdamW(5e-4, weight_decay=0.01)
    opt = optax.adamw(args.lr, weight_decay=0.01)
    opt_state = opt.init(params)
    start_step = 0
    if args.load_weight:
        with open(args.load_weight, 'rb') as f:
            ckpt = pickle.load(f)
        params, opt_state = ckpt['params'], ckpt['opt_state']
        start_step = ckpt['step']

    with open(args.train_anns) as f:
        train_anns = json.load(f)
    with open(args.val_anns) as f:
        val_anns = json.load(f)

    grad_fn = jax.jit(jax.value_and_grad(clip_loss), static_argnums=(1,))
    update = jax.jit(lambda g, s, p: opt.update(g, s, p))

    rng = random.Random(args.seed)
    for step in range(start_step, args.max_steps):
        ann = train_anns[rng.randrange(len(train_anns))]
        sp, tp, src, tgt, _ = load_annotation(ann, LOAD_SIZE,
                                              args.dataset_path)
        sp_out = rescale_points(sp, LOAD_SIZE, OUTPUT_SIZE)
        tp_out = rescale_points(tp, LOAD_SIZE, OUTPUT_SIZE)
        src_idx = jnp.asarray(points_to_idxs(sp_out, OUTPUT_SIZE), jnp.int32)
        tgt_idx = jnp.asarray(points_to_idxs(tp_out, OUTPUT_SIZE), jnp.int32)
        f_src = net.extract(os.path.join(args.dataset_path, src))
        f_tgt = net.extract(os.path.join(args.dataset_path, tgt))
        loss, grads = grad_fn(params, net, f_src, f_tgt, src_idx, tgt_idx)
        updates, opt_state = update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if step % 50 == 0:
            log(f'step {step}: loss {float(loss):.4f}')
        if (step + 1) % args.val_every == 0:
            pck_img, pck_bbox = validate(net, params, val_anns,
                                         args.dataset_path)
            log(f'val/pck_img: {pck_img:.4f}  val/pck_bbox: {pck_bbox:.4f}')
            save_checkpoint(
                os.path.join(args.task_path, f'checkpoint_step_{step+1}.pkl'),
                step + 1, configs, params, opt_state)


if __name__ == '__main__':
    main()
