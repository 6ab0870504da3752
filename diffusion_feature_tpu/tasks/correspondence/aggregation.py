"""Aggregation network for SPair-71k correspondence.

Reference (correspondence/correspondence/aggregation_network.py): wraps 1-N
FeatureExtractors; per image, extracts the configured layers, bilinearly
resizes each to 128x128, channel-concats; with >1 extractor a learned 3x3
conv halves the channel count; a CLIP-style ``logit_scale`` drives the
symmetric cross-entropy loss.

TPU-native notes: extraction is frozen (stop_gradient) and each extractor's
program is its own jitted computation — XLA's async dispatch overlaps the
ensemble members where the reference needed Python threads per GPU
(:67-95).  The trainable state is a pure pytree {conv kernel, logit_scale}
updated with optax.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...facade import FeatureExtractor
from ...ops.resize import interpolate_bilinear_nchw

# fixed SPair class-list prompt (reference :28)
SPAIR_PROMPT = (
    'a highly realistic photo that may contain an aeroplane, a bicycle, a '
    'bird, a boat, a bottle, a bus, a car, a cat, a chair, a cow, a dog, a '
    'horse, a motorbike, a person, a plant within a pot, a sheep, a train, '
    'or a tv monitor.')


class AggregationNetwork:
    def __init__(self, configs: List[dict], weights=None, output_size=(128, 128),
                 prompt: str = SPAIR_PROMPT, algorithm: str = 'conv',
                 seed: int = 0):
        self.output_size = tuple(output_size)
        from ...configs import resolve_layer_config
        self.extractors = []
        for config in configs:
            fe = FeatureExtractor(
                layer=resolve_layer_config(config['layer']),
                version=config['version'],
                attention=config.get('attention'),
                img_size=config['img_size'],
                weights=weights,
                dtype=config.get('dtype', 'bfloat16'),
            )
            self.extractors.append({
                'model': fe,
                'prompt_embeds': fe.encode_prompt(prompt),
                't': config['t'],
            })
            fe.offload_prompt_encoder(persistent=True)

        self.feature_dim = sum(c['feature_len'] for c in configs)
        # reference: conv keeps the dim for one extractor, halves it for
        # ensembles (:20-22); applied when algorithm='conv' (task-corres)
        self.out_dim = (self.feature_dim if len(configs) == 1
                        else self.feature_dim // 2)
        self.do_conv = algorithm == 'conv'
        self._seed = seed

    # ------------------------------------------------------------ parameters
    # CLIP temperature log(1/0.07): a plain tensor in the reference (:25),
    # NOT a registered parameter — the optimizer never updates it
    logit_scale = float(np.log(1 / 0.07))

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self._seed)
        k = jax.nn.initializers.he_normal()(
            rng, (3, 3, self.feature_dim, self.out_dim), jnp.float32)
        return {'out_kernel': k}

    # ------------------------------------------------------------ extraction
    def extract(self, image) -> jnp.ndarray:
        """image (path / PIL) -> frozen stacked features (1, C, 128, 128)."""
        from PIL import Image
        if isinstance(image, str):
            image = Image.open(image)
        feats = []
        for ex in self.extractors:
            out = ex['model'].extract(ex['prompt_embeds'], 1, [image],
                                      t=ex['t'])
            for key in sorted(out):
                f = jnp.asarray(out[key], jnp.float32)
                feats.append(interpolate_bilinear_nchw(f, self.output_size))
        x = jnp.concatenate(feats, axis=1)
        assert x.shape[1] == self.feature_dim, \
            (f'feature_len mismatch: configs promise {self.feature_dim}, '
             f'extraction produced {x.shape[1]}')
        return jax.lax.stop_gradient(x)

    # --------------------------------------------------------------- forward
    def apply(self, params, feats: jnp.ndarray) -> jnp.ndarray:
        """Trainable head: optional 3x3 conv (fp32, reference forward
        :97-100)."""
        if not self.do_conv:
            return feats
        x = feats.astype(jnp.float32).transpose(0, 2, 3, 1)
        x = jax.lax.conv_general_dilated(
            x, params['out_kernel'], window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return x.transpose(0, 3, 1, 2)
