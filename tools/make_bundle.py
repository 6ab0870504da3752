#!/usr/bin/env python
"""Export a TPU deployment bundle from a diffusers-format checkpoint.

One-time conversion (torch safetensors parse + key renames + transposes +
optional int8 quantization) producing a self-contained dir that
``FeatureExtractor(weights=<bundle>)`` warm-starts from directly — see
diffusion_feature_tpu/io/bundle.py.

Usage:
  python tools/make_bundle.py --version flux --weights /ckpts/flux-dev \
      --out /srv/flux-dev.tpu [--dtype bfloat16] [--img_size 1024] \
      [--no_transformer_8bit] [--offline_lora DIR [--offline_lora_filename F]]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--version', required=True)
    ap.add_argument('--weights', required=True,
                    help='diffusers-format checkpoint dir')
    ap.add_argument('--out', required=True, help='bundle output dir')
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--img_size', type=int, default=1024,
                    help='only used to size the throwaway template; params '
                         'are img_size-independent')
    ap.add_argument('--no_transformer_8bit', action='store_true',
                    help='keep the flux transformer bf16 (default: int8 '
                         'weight-only auto-on for flux, matching the facade)')
    ap.add_argument('--no_t5_8bit', action='store_true',
                    help='keep the T5 encoder full precision (default: int8 '
                         'auto-on for flux with real weights, matching the '
                         'facade) — the bundle manifest records the setting '
                         'and warm-start resolves default (auto) flags from '
                         'it, so only an EXPLICITLY conflicting extractor '
                         'flag fails to load')
    ap.add_argument('--offline_lora', default=None,
                    help='merge this LoRA into the exported weights')
    ap.add_argument('--offline_lora_filename', default=None)
    args = ap.parse_args(argv)

    from diffusion_feature_tpu import FeatureExtractor
    t0 = time.perf_counter()
    fe = FeatureExtractor(
        layer=None, version=args.version, img_size=args.img_size,
        dtype=args.dtype, weights=args.weights,
        offline_lora=args.offline_lora,
        offline_lora_filename=args.offline_lora_filename,
        transformer_8bit=(False if args.no_transformer_8bit else None),
        t5_8bit=(False if args.no_t5_8bit else None),
        validate_layers=False)
    t1 = time.perf_counter()
    out = fe.save_converted(args.out)
    t2 = time.perf_counter()
    print(f'converted in {t1 - t0:.1f}s, exported to {out} '
          f'in {t2 - t1:.1f}s')


if __name__ == '__main__':
    main()
