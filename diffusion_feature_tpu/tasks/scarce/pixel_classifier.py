"""Label-scarce pixel classification: MLP ensemble over dumped features.

Reference (scarce_segmentation/segmentation/pixel_classifier.py +
task-pixel.py): per-pixel 3-layer MLP (datasetGAN lineage), ensemble of
``model_num`` members, majority-vote prediction with Jensen-Shannon
uncertainty (entropy of the mean softmax minus mean per-member entropy,
top-10% mean), per-class IoU -> mIoU.

JAX-native: each ensemble member trains as a jitted epoch loop; prediction
vmaps the whole ensemble in one program instead of looping members on GPU.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
import optax


class PixelClassifier(nn.Module):
    """dim -> 128 -> 32 -> C (under 30 classes) or dim -> 256 -> 128 -> C,
    ReLU + BatchNorm after each hidden layer (reference :14-36)."""
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (128, 32) if self.num_classes < 30 else (256, 128)
        for i, w in enumerate(widths):
            x = nn.Dense(w, name=f'dense_{i}')(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f'bn_{i}')(x)
        return nn.Dense(self.num_classes, name='out')(x)


def _entropy(logits_or_probs, from_logits: bool):
    if from_logits:
        logp = jax.nn.log_softmax(logits_or_probs, axis=-1)
        p = jnp.exp(logp)
    else:
        p = logits_or_probs
        logp = jnp.log(jnp.maximum(p, 1e-12))
    return -jnp.sum(p * logp, axis=-1)


def train_one(features: np.ndarray, labels: np.ndarray, num_classes: int,
              seed: int, batch_size: int = 64, lr: float = 1e-3,
              max_epochs: int = 100, patience: int = 50,
              warmup_epochs: int = 3):
    """Train one ensemble member with the reference's early-stopping rule
    (task-pixel.py:116-178): after ``warmup_epochs``, stop when the batch
    loss hasn't improved for ``patience`` steps."""
    model = PixelClassifier(num_classes=num_classes)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((2, features.shape[-1])), train=True)
    params, batch_stats = variables['params'], variables['batch_stats']
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            logits, updates = model.apply(
                {'params': p, 'batch_stats': batch_stats}, xb, train=True,
                mutable=['batch_stats'])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return loss, updates['batch_stats']
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    n = len(features)
    steps_per_epoch = n // batch_size
    np_rng = np.random.RandomState(seed)
    best_loss, break_count, stop = np.inf, 0, False
    for epoch in range(max_epochs):
        perm = np_rng.permutation(n)
        for it in range(steps_per_epoch):
            idx = perm[it * batch_size:(it + 1) * batch_size]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(features[idx]), jnp.asarray(labels[idx]))
            if epoch > warmup_epochs:
                l = float(loss)
                if l < best_loss:
                    best_loss, break_count = l, 0
                else:
                    break_count += 1
                if break_count > patience:
                    stop = True
                    break
        if stop:
            break
    return {'params': params, 'batch_stats': batch_stats}


def train_ensemble(features: np.ndarray, labels: np.ndarray, num_classes: int,
                   model_num: int = 10, **kw) -> List[dict]:
    return [train_one(features, labels, num_classes, seed=i, **kw)
            for i in range(model_num)]


def predict_labels(ensemble: List[dict], features: jnp.ndarray,
                   size: Tuple[int, int], num_classes: int):
    """Majority-vote segmentation + JS uncertainty (reference
    predict_labels :70-107).  Returns (pred (H, W) int array, top_k scalar).
    """
    model = PixelClassifier(num_classes=num_classes)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ensemble)

    @jax.jit
    def run(stacked, feats):
        def member(variables):
            return model.apply(variables, feats, train=False)
        logits = jax.vmap(member)(stacked)            # (M, N, C)
        entropies = _entropy(logits, from_logits=True)      # (M, N)
        mean_seg = jax.nn.softmax(logits, axis=-1).mean(axis=0)  # (N, C)
        full_entropy = _entropy(mean_seg, from_logits=False)     # (N,)
        js = full_entropy - entropies.mean(axis=0)
        k = max(1, js.shape[0] // 10)
        top_k = jax.lax.top_k(js, k)[0].mean()
        votes = jnp.argmax(logits, axis=-1)           # (M, N)
        onehot = jax.nn.one_hot(votes, num_classes, dtype=jnp.int32).sum(0)
        pred = jnp.argmax(onehot, axis=-1)            # majority; ties -> low id
        return pred, top_k

    pred, top_k = run(stacked, features)
    return np.asarray(pred).reshape(size), float(top_k)


def compute_iou(preds: List[np.ndarray], gts: List[np.ndarray],
                num_classes: int, ignore_label: Optional[int] = None):
    """Per-class IoU over the dataset -> (ious dict, mIoU) (reference
    task-pixel.py:126-151 semantics)."""
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for p, g in zip(preds, gts):
        p, g = np.asarray(p).ravel(), np.asarray(g).ravel()
        if ignore_label is not None:
            keep = g != ignore_label
            p, g = p[keep], g[keep]
        for c in range(num_classes):
            pi, gi = p == c, g == c
            inter[c] += np.logical_and(pi, gi).sum()
            union[c] += np.logical_or(pi, gi).sum()
    # reference semantics: absent classes score IoU 0 and the mean runs
    # over ALL classes (task-pixel compute_iou: inter/(1e-8+union))
    ious = inter / (1e-8 + union)
    present = union > 0
    miou = float(ious.mean())
    return {c: float(ious[c]) for c in range(num_classes) if present[c]}, miou
