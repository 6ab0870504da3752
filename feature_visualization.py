#!/usr/bin/env python
"""Visualize dumped features via per-block PCA projection to RGB, plus
per-token attention heatmaps.

Mirrors the reference feature_visualization.py: load one ``.npy`` feature
dump, split the channel axis into blocks (``--block_divide``, reference
:47-54), optionally split off attention-map channel groups
(``--attn_blocks`` as size:token-len pairs, :58-78), PCA each block down to 3
channels and save as an image (:84-101), and emit per-token heatmaps for
attention blocks (:107-120).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pca_to_rgb(feat: np.ndarray) -> np.ndarray:
    """(C, H, W) -> (H, W, 3) uint8 via PCA over channel vectors."""
    c, h, w = feat.shape
    x = feat.reshape(c, h * w).T.astype(np.float64)        # (HW, C)
    x = x - x.mean(axis=0, keepdims=True)
    # top-3 principal components via SVD
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T                                    # (HW, <=3)
    if proj.shape[1] < 3:                 # 1/2-channel blocks: pad to RGB
        proj = np.pad(proj, ((0, 0), (0, 3 - proj.shape[1])))
    lo = proj.min(axis=0, keepdims=True)
    hi = proj.max(axis=0, keepdims=True)
    img = (proj - lo) / np.maximum(hi - lo, 1e-8)
    return (img.reshape(h, w, 3) * 255).astype(np.uint8)


def save_image(arr: np.ndarray, path: str, upscale: int = 1):
    from PIL import Image
    im = Image.fromarray(arr)
    if upscale > 1:
        im = im.resize((arr.shape[1] * upscale, arr.shape[0] * upscale),
                       Image.NEAREST)
    im.save(path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('feature_file', type=str,
                        help='path to a dumped .npy feature')
    parser.add_argument('--output_dir', type=str, default='./viz/')
    parser.add_argument('--block_divide', type=int, nargs='+', default=None,
                        help='channel counts per block; default = one block')
    parser.add_argument('--attn_blocks', type=str, nargs='+', default=None,
                        help='attention channel groups as SIZE:TOKENS pairs '
                             '(e.g. 32:77), consumed from the END of the '
                             'channel axis like the reference')
    parser.add_argument('--max_tokens', type=int, default=16,
                        help='cap per-token heatmaps emitted per attn block')
    parser.add_argument('--upscale', type=int, default=4)
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    feat = np.load(args.feature_file).astype(np.float32)
    if feat.ndim == 4:       # batched dump: take the first sample
        feat = feat[0]
    c, h, w = feat.shape
    stem = os.path.splitext(os.path.basename(args.feature_file))[0]
    print(f'{stem}: {c} channels @ {h}x{w}')

    # split attention blocks off the channel tail (reference :58-78)
    attn_specs = []
    if args.attn_blocks:
        for spec in args.attn_blocks:
            size, tokens = (int(v) for v in spec.split(':'))
            attn_specs.append((size, tokens))
        attn_channels = sum(t for _, t in attn_specs)
        feat, attn_feat = feat[:c - attn_channels], feat[c - attn_channels:]
    else:
        attn_feat = None

    # channel blocks (reference :47-54)
    blocks = args.block_divide or [feat.shape[0]]
    assert sum(blocks) == feat.shape[0], \
        f'block_divide sums to {sum(blocks)}, feature has {feat.shape[0]}'
    start = 0
    for i, nch in enumerate(blocks):
        block = feat[start:start + nch]
        start += nch
        out = os.path.join(args.output_dir, f'{stem}_block{i}.png')
        save_image(pca_to_rgb(block), out, args.upscale)
        print('wrote', out)

    # per-token attention heatmaps (reference :107-120)
    if attn_feat is not None:
        start = 0
        for bi, (size, tokens) in enumerate(attn_specs):
            group = attn_feat[start:start + tokens]
            start += tokens
            for tok in range(min(tokens, args.max_tokens)):
                m = group[tok]
                m = (m - m.min()) / max(m.max() - m.min(), 1e-8)
                heat = (np.stack([m, np.zeros_like(m), 1 - m], -1) * 255)
                out = os.path.join(args.output_dir,
                                   f'{stem}_attn{bi}_tok{tok}.png')
                save_image(heat.astype(np.uint8), out, args.upscale)
            print(f'wrote {min(tokens, args.max_tokens)} heatmaps for '
                  f'attn block {bi} (size {size})')


if __name__ == '__main__':
    main()
