#!/usr/bin/env python
"""Background extraction demo: extract features DURING image generation.

Mirrors the reference's generate_with_extraction.py: run a normal text2img
sampling loop and keep the activations of selected U-Net-call encounters
(set_background_extraction([1, 10, 20, 30, 40]); results keyed
layer -> {step -> tensor}, reference :21-48).

TPU-native difference: the whole generation loop (all denoise steps + taps)
compiles to one XLA program; there is no external torch pipeline to wrap, the
framework's own sampling loop plays that role.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffusion_feature_tpu import FeatureExtractor  # noqa: E402
from diffusion_feature_tpu.configs import resolve_layer_config  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--layer', type=str, default='15-practical')
    parser.add_argument('--version', type=str, default='1-5')
    parser.add_argument('--prompt', type=str,
                        default='a photograph of an astronaut riding a horse')
    parser.add_argument('--img_size', type=int, default=512)
    parser.add_argument('--steps', type=int, default=50)
    parser.add_argument('--guidance_scale', type=float, default=7.5)
    parser.add_argument('--store_steps', type=int, nargs='+',
                        default=[1, 10, 20, 30, 40])
    parser.add_argument('--dtype', type=str, default='bfloat16')
    parser.add_argument('--weights', type=str, default=None)
    parser.add_argument('--weights_variant', type=str, default=None)
    parser.add_argument('--output', type=str, default='generated.png')
    args = parser.parse_args(argv)

    df = FeatureExtractor(resolve_layer_config(args.layer), args.version,
                          img_size=args.img_size, dtype=args.dtype,
                          weights=args.weights,
                          weights_variant=args.weights_variant)
    # which U-Net-call encounters to keep (reference :33)
    df.set_background_extraction(args.store_steps)

    prompts = df.encode_prompt(args.prompt)
    images, _ = df.sample(prompts, batch_size=1,
                          num_inference_steps=args.steps,
                          guidance_scale=args.guidance_scale)

    from PIL import Image
    arr = (np.asarray(images[0], np.float32).transpose(1, 2, 0) * 255)
    Image.fromarray(arr.astype('uint8')).save(args.output)
    print(f'saved {args.output}')

    # reference :42-48: report stored features per layer/step
    results = df.get_background_extraction()
    for layer, by_step in results.items():
        for step, feat in sorted(by_step.items()):
            print(layer, f'step={step}', tuple(np.shape(feat)))


if __name__ == '__main__':
    main()
