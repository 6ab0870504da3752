#!/usr/bin/env python
"""Measure the deployment-bundle warm-start win at REAL Flux.1-dev size.

Writes a full-size synthetic bf16 diffusers checkpoint (12B transformer +
T5-XXL + CLIP-L + VAE, real config.json dims — values random, timing is
value-independent), then times the three serving-relevant phases on this
host:

  1. cold start:  FeatureExtractor(weights=<checkpoint>)  — safetensors
     parse + key renames + transposes + int8 quantization (the work the
     reference re-runs on every process start via from_pretrained,
     feature/components/models.py:10-172)
  2. export:      fe.save_converted(<bundle>)             — one-time
  3. warm start:  FeatureExtractor(weights=<bundle>)      — mmap'd npy

Runs on CPU (JAX_PLATFORMS=cpu): both paths pay the same host->TPU device
transfer in production, so the host-side delta is the honest comparison —
and it keeps the one real chip free.

Usage:  python tools/bundle_timing.py [workdir] [--keep]
Prints one JSON line; deletes the ~34 GiB checkpoint + bundle unless
--keep.  Needs ~60 GiB free RAM and ~55 GiB free disk.
"""

import gc
import json
import os
import shutil
import sys
import time

# Force CPU: the session env pins JAX_PLATFORMS=axon (TPU tunnel), which
# would route device puts over the network and distort the host-side timing
# this tool exists to measure.
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import ml_dtypes


def _fast_bf16(gen):
    def leaf(shape):
        a = gen.random(shape or (), dtype=np.float32)
        a -= 0.5
        a *= 0.1
        return a.astype(ml_dtypes.bfloat16)
    return leaf


def write_fullsize_flux_checkpoint(root: str) -> str:
    """Real-dim Flux.1-dev checkpoint with random bf16 tensors, through the
    SAME writer the tests use (tests/synth_checkpoint.write_flux_checkpoint
    parameterized with the real configs — one config-schema source).
    Templates come from eval_shape (no 12B tree is ever materialized);
    per-component dicts peak at ~24 GiB during the transformer's save_file."""
    from synth_checkpoint import write_flux_checkpoint

    from diffusion_feature_tpu.models.flux import FLUX_DEV
    from diffusion_feature_tpu.models.vae import FLUX_VAE
    from diffusion_feature_tpu.models.t5 import T5Config
    from diffusion_feature_tpu.models.clip_text import CLIPTextConfig

    gen = np.random.Generator(np.random.SFC64(0))
    return write_flux_checkpoint(
        root, dtype=ml_dtypes.bfloat16, leaf_fn=_fast_bf16(gen),
        progress=True,
        cfgs=dict(
            flux=FLUX_DEV,       # 19+38 blocks, 3072 hidden, 24 heads
            vae=FLUX_VAE,
            clip=CLIPTextConfig(),   # CLIP-L defaults are the real dims
            t5=T5Config(),           # T5-XXL defaults are the real dims
            vae_json={'scaling_factor': FLUX_VAE.scaling_factor,
                      'shift_factor': FLUX_VAE.shift_factor,
                      'use_quant_conv': False}))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    keep = '--keep' in argv
    argv = [a for a in argv if a != '--keep']
    work = argv[0] if argv else '/tmp/bundle_timing'

    from diffusion_feature_tpu import FeatureExtractor

    ckpt = os.path.join(work, 'ckpt')
    bundle = os.path.join(work, 'bundle')
    # reuse only a COMPLETE checkpoint: the sentinel is written after the
    # last component lands, so an interrupted first run (OOM-kill mid
    # T5-XXL save is the likely failure at ~60 GiB RAM) is rewritten, not
    # silently reused and crashed on
    sentinel = os.path.join(ckpt, '.complete')
    if not os.path.isfile(sentinel):
        if os.path.isdir(ckpt):
            print(f'removing incomplete checkpoint at {ckpt}...',
                  file=sys.stderr)
            shutil.rmtree(ckpt)
        print('writing full-size synthetic checkpoint...', file=sys.stderr)
        write_fullsize_flux_checkpoint(ckpt)
        open(sentinel, 'w').close()

    kw = dict(layer={'vit-block0-out': True}, version='flux', img_size=512,
              dtype='bfloat16', validate_layers=False)

    print('cold start (convert + int8 quantize)...', file=sys.stderr)
    t0 = time.perf_counter()
    fe = FeatureExtractor(weights=ckpt, **kw)
    cold_s = time.perf_counter() - t0

    print('export bundle...', file=sys.stderr)
    shutil.rmtree(bundle, ignore_errors=True)   # save_bundle refuses non-empty
    t0 = time.perf_counter()
    fe.save_converted(bundle)
    export_s = time.perf_counter() - t0
    del fe
    gc.collect()

    print('warm start (bundle)...', file=sys.stderr)
    t0 = time.perf_counter()
    fe2 = FeatureExtractor(weights=bundle, **kw)
    warm_s = time.perf_counter() - t0
    assert fe2.spec.dit.quantize_int8, 'expected auto-int8 from bundle'
    del fe2
    gc.collect()

    def _dir_gib(d):
        total = 0
        for dp, _, fns in os.walk(d):
            total += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
        return total / 2**30

    out = {'metric': 'flux_12b_bundle_warm_start',
           'cold_start_s': round(cold_s, 1),
           'bundle_export_s': round(export_s, 1),
           'warm_start_s': round(warm_s, 1),
           'speedup': round(cold_s / warm_s, 1),
           'checkpoint_gib': round(_dir_gib(ckpt), 1),
           'bundle_gib': round(_dir_gib(bundle), 1)}
    if not keep:
        # remove only what this tool created: `work` may be a pre-existing
        # directory with unrelated contents
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(bundle, ignore_errors=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
