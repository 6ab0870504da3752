"""DiffusionSegmentor: frozen diffusion features -> adapters -> UPerNet.

Reference: segmentation/models/diffusion_segmentor.py (mmseg BaseSegmentor
subclass).  This is a native orchestrator instead of an mmseg plugin: the
trainable state (per-layer ResBlock adapters + per-level sum adapters +
UPerHead + FCNHead (+ optional prompt-tuning embeddings)) is one Flax module
whose params/batch_stats form a pure pytree; the diffusion extractor stays
frozen and its jitted extraction program is shared across steps.

Semantics preserved:
  - random t from the configured list during training, first element at test
    (:212-217); random control on/off likewise (:218-223)
  - adapters run fp32 regardless of extraction dtype (:233-246)
  - per-level channel-concat then sum-ResBlock (:233-246)
  - prompt tuning replaces prompt embeds with trainable tensors (:109-126)
  - sliding-window inference with logit accumulation (:421-472)
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...facade import FeatureExtractor
from ...io.images import resize_tensor_batch
from .heads import FCNHead, ResBlockAdapter, UPerHead
from .losses import segmentation_loss


def _san(layer_id: str) -> str:
    return layer_id.replace('-', '_')


class SegHead(nn.Module):
    """Adapters + decode/aux heads as one trainable module.

    ``model_feature_layers``: per model, per level, a tuple of
    (layer_id, channels) (config ade_sdxl.py:60-63; multi-model "Ours-XL-t"
    wiring from diffusion_segmentor.py:155-183 — per-model adapters and sum
    blocks, then a per-level 'amalgamated' ResBlock over the cross-model
    concat).  Feature dict keys are plain layer ids for a single model and
    ``m{i}:{layer_id}`` for ensembles.
    """
    model_feature_layers: Tuple[Tuple[Tuple[Tuple[str, int], ...], ...], ...]
    num_classes: int = 150
    head_channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2)
    aux_in_index: int = -1
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False,
                 dropout_rng=None):
        n_models = len(self.model_feature_layers)
        n_levels = max(len(fl) for fl in self.model_feature_layers)
        per_level: List[List[jnp.ndarray]] = [[] for _ in range(n_levels)]
        for mi, fl in enumerate(self.model_feature_layers):
            suffix = '' if n_models == 1 else f'_m{mi}'
            for level, res_level in enumerate(fl):
                if not res_level:
                    continue
                # multi-model mode uses MultiRes: the SAME (weight-shared)
                # ResBlock applied 4x per layer and 2x per sum block
                # (reference diffusion_segmentor.py:177-180, MultiRes :43-51)
                n_layer_apps = 1 if n_models == 1 else 4
                n_sum_apps = 1 if n_models == 1 else 2
                per = []
                for lid, ch in res_level:
                    key = lid if n_models == 1 else f'm{mi}:{lid}'
                    f = features[key].astype(jnp.float32)
                    blk = ResBlockAdapter(
                        ch, name=f'adapter{suffix}_{_san(lid)}')
                    for _ in range(n_layer_apps):
                        f = blk(f, train)
                    per.append(f)
                x = jnp.concatenate(per, axis=1)
                sum_blk = ResBlockAdapter(x.shape[1],
                                          name=f'sum{level}{suffix}')
                for _ in range(n_sum_apps):
                    x = sum_blk(x, train)
                per_level[level].append(x)

        outs = []
        for level, feats in enumerate(per_level):
            x = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]
            if n_models > 1:
                x = ResBlockAdapter(x.shape[1],
                                    name=f'amalgamated{level}')(x, train)
            outs.append(x)

        in_channels = tuple(
            sum(c for fl in self.model_feature_layers
                for _, c in (fl[lvl] if lvl < len(fl) else ()))
            for lvl in range(n_levels))
        r1 = r2 = None
        if dropout_rng is not None:
            r1, r2 = jax.random.split(dropout_rng)
        decode = UPerHead(in_channels=in_channels,
                          channels=self.head_channels,
                          pool_scales=self.pool_scales,
                          num_classes=self.num_classes,
                          dropout_ratio=self.dropout_ratio,
                          name='decode_head')(outs, train, r1)
        aux = FCNHead(channels=self.head_channels,
                      num_classes=self.num_classes,
                      dropout_ratio=self.dropout_ratio,
                      name='auxiliary_head')(outs[self.aux_in_index], train, r2)
        return decode, aux


class DiffusionSegmentor:
    """Host orchestrator: frozen FeatureExtractor(s) + trainable SegHead."""

    def __init__(self, diffusion_feature, feature_layers,
                 num_classes: int = 150, head_channels: int = 512,
                 pool_scales=(1, 2), aux_in_index: Optional[int] = None,
                 prompt: str = '', prompt_tuning: bool = False, weights=None,
                 seed: int = 0):
        self.multi = isinstance(diffusion_feature, (list, tuple))
        df_list = (list(diffusion_feature) if self.multi
                   else [diffusion_feature])
        if self.multi:
            # per-model feature layers (reference multi mode, ade_full.py)
            mfl = feature_layers
        else:
            mfl = [feature_layers]
        self.model_feature_layers = tuple(
            tuple(tuple((lid, ch) for lid, ch in lvl) for lvl in fl)
            for fl in mfl)

        def build(df):
            control = df.get('control')
            fe = FeatureExtractor(
                layer=df['layer'],
                version=df['version'],
                attention=df.get('attention'),
                img_size=df['img_size'],
                train_unet=df.get('train_unet', False),
                dtype=df.get('dtype',
                             'float32' if (prompt_tuning
                                           or df.get('train_unet', False))
                             else 'bfloat16'),
                control=control[0] if control else None,
                offline_lora=df.get('offline_lora'),
                weights=weights,
            )
            choices = None
            if control:
                n = control[1] if len(control) > 1 else 0
                choices = ([True] * n + [False]) if n > 0 else [True]
            pe = fe.encode_prompt(prompt)
            fe.offload_prompt_encoder(persistent=True)
            return {'model': fe, 'prompt_embeds': pe, 't': df['t'],
                    'control_choices': choices}

        self.extractors = [build(df) for df in df_list]
        # single-model aliases (main code path + prompt tuning)
        self.extractor = self.extractors[0]['model']
        self.prompt_embeds = self.extractors[0]['prompt_embeds']
        self.t = self.extractors[0]['t']
        self.use_control_choices = self.extractors[0]['control_choices']

        self.prompt_tuning = prompt_tuning
        if prompt_tuning and self.multi:
            raise NotImplementedError('prompt tuning with the multi-model '
                                      'ensemble is not supported (nor used '
                                      'by the reference configs)')
        n_levels = max(len(fl) for fl in self.model_feature_layers)
        if aux_in_index is None:
            # reference configs pin the aux head to level 1 (ade_sdxl.py:38)
            aux_in_index = min(1, n_levels - 1)
        self.head = SegHead(model_feature_layers=self.model_feature_layers,
                            num_classes=num_classes,
                            head_channels=head_channels,
                            pool_scales=tuple(pool_scales),
                            aux_in_index=aux_in_index)
        self._seed = seed
        self._rng = random.Random(seed)

    # ------------------------------------------------------------------ init
    def init_state(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self._seed)
        imgs = np.zeros((1, 3, 64, 64), np.float32)
        feats = self.extract_features(jnp.asarray(imgs), is_test=True)
        variables = self.head.init(rng, feats, train=False)
        params = {'head': variables['params']}
        if self.prompt_tuning:
            # trainable prompt replacements (reference :109-126): randn init
            # with the encoded embeds' shapes (torch.randn, not a copy)
            pe = list(self.prompt_embeds)
            r1, r2 = jax.random.split(jax.random.fold_in(rng, 1))
            params['meta_prompt'] = jax.random.normal(
                r1, jnp.shape(pe[0]), jnp.float32)
            if pe[2] is not None:
                params['meta_pooled'] = jax.random.normal(
                    r2, jnp.shape(pe[2]), jnp.float32)
        return params, variables.get('batch_stats', {})

    # -------------------------------------------------------------- features
    def _pick_t(self, is_test: bool) -> int:
        if isinstance(self.t, (list, tuple)):
            return self.t[0] if is_test else self._rng.choice(self.t)
        return self.t

    def _pick_control(self, is_test: bool) -> bool:
        if self.use_control_choices is None:
            return False
        return True if is_test else self._rng.choice(self.use_control_choices)

    def extract_features(self, images: jnp.ndarray, is_test: bool = False,
                         params: Optional[dict] = None) -> Dict[str, jnp.ndarray]:
        """images (B, 3, H, W) in [-1, 1] -> {layer: (B, C, h, w)} frozen
        features.  With prompt tuning, ``params['meta_prompt']`` overrides
        the text conditioning and gradients flow through the extractor's
        jitted step.  Multi-model mode namespaces keys as ``m{i}:{layer}``
        (sequential extraction, reference :275-285 — the threaded variant is
        commented out there too; XLA async dispatch overlaps the programs)."""
        if self.multi:
            out = {}
            for mi, ex in enumerate(self.extractors):
                f = ex['model'].extract(
                    prompts=ex['prompt_embeds'],
                    batch_size=images.shape[0],
                    image=images, image_type='tensors',
                    t=(ex['t'][0] if isinstance(ex['t'], (list, tuple))
                       and is_test else
                       (self._rng.choice(ex['t'])
                        if isinstance(ex['t'], (list, tuple)) else ex['t'])),
                )
                for k, v in f.items():
                    out[f'm{mi}:{k}'] = v
            return jax.tree.map(jax.lax.stop_gradient, out)

        prompts = self.prompt_embeds
        if self.prompt_tuning and params is not None:
            pe = list(prompts)
            pe[0] = params['meta_prompt']
            if 'meta_pooled' in params:
                pe[2] = params['meta_pooled']
            prompts = tuple(pe)
        feats = self.extractor.extract(
            prompts=prompts,
            batch_size=images.shape[0],
            image=images,
            image_type='tensors',
            t=self._pick_t(is_test),
            use_control=self._pick_control(is_test),
        )
        if not self.prompt_tuning:
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        return feats

    # ------------------------------------------------------------------ loss
    def head_loss(self, params, batch_stats, feats, labels, dropout_rng):
        """Trainable-head objective over pre-extracted features — pure and
        jittable (the trainer compiles this once; the frozen extraction runs
        in its own cached program)."""
        (decode, aux), updates = self.head.apply(
            {'params': params['head'], 'batch_stats': batch_stats},
            feats, train=True, dropout_rng=dropout_rng,
            mutable=['batch_stats'])
        hw = labels.shape[-2:]

        def up(x):
            b, c = x.shape[:2]
            return jax.image.resize(x, (b, c) + tuple(hw), method='bilinear')

        total, parts = segmentation_loss(up(decode), up(aux), labels)
        return total, (parts, updates['batch_stats'])

    def loss(self, params, batch_stats, images, labels, dropout_rng):
        """Full training objective at label resolution (mmseg semantics:
        logits upsampled to the label map before the loss).  With prompt
        tuning, gradients flow through the extraction step."""
        feats = self.extract_features(images, is_test=False, params=params)
        return self.head_loss(params, batch_stats, feats, labels, dropout_rng)

    # ------------------------------------------------------------- inference
    def predict_logits(self, params, batch_stats, images) -> jnp.ndarray:
        feats = self.extract_features(images, is_test=True, params=params)
        decode, _ = self.head.apply(
            {'params': params['head'], 'batch_stats': batch_stats},
            feats, train=False)
        b, c = decode.shape[:2]
        return jax.image.resize(
            decode, (b, c) + tuple(images.shape[-2:]), method='bilinear')

    def slide_inference(self, params, batch_stats, images,
                        crop_size=(512, 512), stride=(512, 512)) -> jnp.ndarray:
        """Sliding-window logits (reference slide_inference :421-472):
        accumulate crop logits and normalize by visit counts."""
        b, _, H, W = images.shape
        ch, cw = crop_size
        sh, sw = stride
        num_classes = self.head.num_classes
        preds = jnp.zeros((b, num_classes, H, W), jnp.float32)
        count = jnp.zeros((1, 1, H, W), jnp.float32)
        h_grids = max(H - ch + sh - 1, 0) // sh + 1
        w_grids = max(W - cw + sw - 1, 0) // sw + 1
        for i in range(h_grids):
            for j in range(w_grids):
                y1, x1 = i * sh, j * sw
                y2, x2 = min(y1 + ch, H), min(x1 + cw, W)
                y1, x1 = max(y2 - ch, 0), max(x2 - cw, 0)
                crop = images[:, :, y1:y2, x1:x2]
                logits = self.predict_logits(params, batch_stats, crop)
                preds = preds.at[:, :, y1:y2, x1:x2].add(logits)
                count = count.at[:, :, y1:y2, x1:x2].add(1.0)
        return preds / count

    def predict(self, params, batch_stats, images, mode: str = 'whole',
                **kw) -> np.ndarray:
        if mode == 'slide':
            logits = self.slide_inference(params, batch_stats, images, **kw)
        else:
            logits = self.predict_logits(params, batch_stats, images)
        return np.asarray(jnp.argmax(logits, axis=1))
