"""Activation-tap system: compile-time layer selection.

The reference implements feature capture by assigning ``FeatureGatherer``
objects onto torch modules and checking ``hasattr(self, 'feature_gatherer')``
inside forward passes (reference: feature/components/feature_extractor.py:83-89,
feature/diffusers/models/resnet.py:371-377).  That pattern is hostile to XLA
tracing, so here layer selection is a *static* ``TapSpec`` threaded through the
Flax module tree.  Taps whose id is not requested are never sown, so XLA
dead-code-eliminates the capture entirely; requested taps become extra jitted
outputs.

Layer-id grammar (byte-compatible with the reference,
feature/components/feature_extractor.py:92-288):

  U-Nets:   {down|up}-level{L}-repeat{R}-res-{increment|out}
            {down|up}-level{L}-repeat{R}-vit-out
            {down|up}-level{L}-repeat{R}-vit-block{B}-out
            {down|up}-level{L}-repeat{R}-vit-block{B}-{self|cross}-{q|k|v|map}
            {down|up}-level{L}-repeat{R}-vit-block{B}-ffn-inner
            down-level{L}-downsampler-out / up-level{L}-upsampler-out
            mid-repeat{R}-res-*, mid-vit-out, mid-vit-block{B}-*
            unet-in, unet-after-conv-in, unet-out
  DiTs:     vit-block{i}-out, vit-block{i}-{self|cross}-{q|k|v|map},
            vit-block{i}-ffn-inner
  Flux:     vit-block{i}-out / -norm-out / -q/-k/-v / -attn-out /
            -cross-map / -self-map / vit-block{i}-ffn-inner
  Pseudo:   vae-out, attn (assembled by the facade, reference
            feature/diffusion_feature.py:477-500)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterable, Mapping

import jax.numpy as jnp

# cross-attention k/v features are token-aligned with the *prompt*, not the
# image, so the reference drops them unconditionally at store time
# (feature/components/feature_extractor.py:38-39).
_FILTERED_SUBSTRINGS = ('cross-k', 'cross-v')


def is_filtered_id(tap_id: str) -> bool:
    return any(s in tap_id for s in _FILTERED_SUBSTRINGS)


@dataclasses.dataclass(frozen=True)
class TapSpec:
    """Static (hashable) description of which activation taps to capture.

    ``accept_all`` reproduces the reference's show-all-layers mode where an
    empty config stores every tap (feature/components/feature_extractor.py:10-15).
    """

    ids: frozenset = frozenset()
    accept_all: bool = False

    @staticmethod
    def none() -> 'TapSpec':
        return TapSpec()

    @staticmethod
    def all() -> 'TapSpec':
        return TapSpec(accept_all=True)

    @staticmethod
    def from_config(config) -> 'TapSpec':
        """Build from a layer config: path to JSON, dict[str,bool], or iterable.

        JSON format matches the reference's layer configs
        (feature/configs/config_15_practical.json): {layer-id: bool}.
        An empty/None config selects accept-all mode.
        """
        if config is None:
            return TapSpec.all()
        if isinstance(config, str):
            if config.lstrip().startswith('{'):
                config = json.loads(config)        # inline JSON
            else:
                with open(config, 'r') as f:
                    config = json.load(f)
        if isinstance(config, Mapping):
            ids = frozenset(k for k, v in config.items() if v)
        elif isinstance(config, Iterable):
            ids = frozenset(config)
        else:
            raise TypeError(f'unsupported layer config type: {type(config)}')
        if not ids:
            return TapSpec.all()
        return TapSpec(ids=ids)

    def wants(self, tap_id: str) -> bool:
        if is_filtered_id(tap_id):
            return False
        return self.accept_all or tap_id in self.ids

    def wants_prefix(self, prefix: str) -> bool:
        """True if any requested id starts with ``prefix`` (cheap pruning)."""
        if self.accept_all:
            return True
        p = prefix + '-'
        return any(i.startswith(p) or i == prefix for i in self.ids)

    @property
    def wants_any_map(self) -> bool:
        """Whether any attention score-map layer is requested — decides whether
        the attention op must materialize/export softmax scores
        (reference: feature/diffusion_feature.py:70-77)."""
        return self.accept_all or any('map' in i for i in self.ids)


EMPTY = TapSpec.none()


def child_id(prefix: str, *parts) -> str:
    """Join id parts with '-', mirroring the reference's
    ``'-'.join([module_id, feat_id])`` (feature_extractor.py:89)."""
    items = [prefix] if prefix else []
    items += [str(p) for p in parts]
    return '-'.join(items)


def sow_tap(module, feat_id: str, value, layout: str = 'native'):
    """Capture ``value`` under this module's tap id if requested.

    ``module`` must carry ``taps: TapSpec`` and ``tap_name: str`` fields.
    ``layout`` declares how to convert to the reference's tensor layout:
      - 'native':  stored as-is (already matches reference layout)
      - 'nhwc':    (B,H,W,C) -> (B,C,H,W) to match torch conv features
      - 'tokens':  (B,S,C) stored as-is (store-side reshape handles B,C,h,w)
    """
    prefix = getattr(module, 'tap_name', '')
    full = child_id(prefix, feat_id) if feat_id else prefix
    if not module.taps.wants(full):
        return
    if layout == 'nhwc':
        value = jnp.transpose(value, (0, 3, 1, 2))
    module.sow('taps', full, value)


def flatten_taps(tree) -> dict:
    """Flatten a flax 'taps' collection (nested by module path) into a flat
    {tap_id: value} dict.  Tap ids are globally unique by construction.  When
    a tap fired several times in one trace (multi-step denoising), the sown
    tuple keeps every encounter in call order; single encounters are unwrapped.
    """
    flat = {}

    def rec(node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                if isinstance(v, Mapping):
                    rec(v)
                else:
                    vals = tuple(v) if isinstance(v, (tuple, list)) else (v,)
                    if k in flat:
                        flat[k] = flat[k] + vals
                    else:
                        flat[k] = vals

    rec(tree)
    return {k: (v[0] if len(v) == 1 else v) for k, v in flat.items()}
