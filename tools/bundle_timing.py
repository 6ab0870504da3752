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
    """Real-dim Flux.1-dev checkpoint with random bf16 tensors.  Templates
    come from eval_shape (no 12B tree is ever materialized); per-component
    dicts peak at ~24 GiB during the transformer's save_file."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file
    from synth_checkpoint import synth_state_from_template

    from diffusion_feature_tpu.models.flux import FluxTransformer2D, FLUX_DEV
    from diffusion_feature_tpu.models.vae import AutoencoderKL, FLUX_VAE
    from diffusion_feature_tpu.models.t5 import T5EncoderModel, T5Config
    from diffusion_feature_tpu.models.clip_text import (
        CLIPTextModel, CLIPTextConfig)

    root = str(root)
    for comp in ('transformer', 'vae', 'text_encoder', 'text_encoder_2'):
        os.makedirs(os.path.join(root, comp), exist_ok=True)
    r = jax.random.PRNGKey(0)
    gen = np.random.Generator(np.random.SFC64(0))
    leaf_fn = _fast_bf16(gen)

    fcfg = FLUX_DEV                      # 19+38 blocks, 3072 hidden, 24 heads
    json.dump({
        'in_channels': fcfg.in_channels,
        'num_layers': fcfg.num_layers,
        'num_single_layers': fcfg.num_single_layers,
        'attention_head_dim': fcfg.attention_head_dim,
        'num_attention_heads': fcfg.num_attention_heads,
        'joint_attention_dim': fcfg.joint_attention_dim,
        'pooled_projection_dim': fcfg.pooled_projection_dim,
        'guidance_embeds': fcfg.guidance_embeds,
        'axes_dims_rope': list(fcfg.axes_dims_rope),
    }, open(os.path.join(root, 'transformer', 'config.json'), 'w'))
    model = FluxTransformer2D(cfg=fcfg, grid_hw=(2, 2), text_len=8)
    tmpl = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 4, fcfg.in_channels)), 500.0,
            jnp.zeros((1, 8, fcfg.joint_attention_dim)),
            jnp.zeros((1, fcfg.pooled_projection_dim))),
        r)['params']
    t0 = time.perf_counter()
    state = synth_state_from_template(tmpl, leaf_fn=leaf_fn,
                                        dtype=ml_dtypes.bfloat16)
    n_tx = sum(int(np.prod(v.shape)) for v in state.values())
    save_file(state, os.path.join(root, 'transformer',
                                  'diffusion_pytorch_model.safetensors'))
    del state, tmpl
    gc.collect()
    print(f'  transformer: {n_tx / 1e9:.2f}B params written in '
          f'{time.perf_counter() - t0:.0f}s', file=sys.stderr)

    json.dump({'in_channels': 3, 'out_channels': 3,
               'latent_channels': FLUX_VAE.latent_channels,
               'block_out_channels': list(FLUX_VAE.block_out_channels),
               'layers_per_block': FLUX_VAE.layers_per_block,
               'scaling_factor': FLUX_VAE.scaling_factor,
               'shift_factor': FLUX_VAE.shift_factor,
               'use_quant_conv': False},
              open(os.path.join(root, 'vae', 'config.json'), 'w'))
    vae = AutoencoderKL(cfg=FLUX_VAE)
    vtmpl = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 3, 32, 32)),
                           method=AutoencoderKL.full_pass), r)['params']
    save_file(synth_state_from_template(vtmpl, leaf_fn=leaf_fn,
                                        dtype=ml_dtypes.bfloat16),
              os.path.join(root, 'vae',
                           'diffusion_pytorch_model.safetensors'))

    ccfg = CLIPTextConfig()              # CLIP-L defaults are the real dims
    json.dump({'vocab_size': ccfg.vocab_size, 'hidden_size': ccfg.hidden_size,
               'intermediate_size': ccfg.intermediate_size,
               'num_hidden_layers': ccfg.num_hidden_layers,
               'num_attention_heads': ccfg.num_attention_heads,
               'max_position_embeddings': ccfg.max_position_embeddings,
               'hidden_act': 'quick_gelu',
               'architectures': ['CLIPTextModel']},
              open(os.path.join(root, 'text_encoder', 'config.json'), 'w'))
    clip = CLIPTextModel(cfg=ccfg)
    ctmpl = jax.eval_shape(
        lambda k: clip.init(k, jnp.zeros((1, 77), jnp.int32)), r)['params']
    save_file(synth_state_from_template(ctmpl, leaf_fn=leaf_fn,
                                        dtype=ml_dtypes.bfloat16),
              os.path.join(root, 'text_encoder', 'model.safetensors'))

    tcfg = T5Config()                    # T5-XXL defaults are the real dims
    json.dump({'vocab_size': tcfg.vocab_size, 'd_model': tcfg.d_model,
               'd_kv': tcfg.d_kv, 'd_ff': tcfg.d_ff,
               'num_layers': tcfg.num_layers, 'num_heads': tcfg.num_heads},
              open(os.path.join(root, 'text_encoder_2', 'config.json'), 'w'))
    t5 = T5EncoderModel(cfg=tcfg)
    t0 = time.perf_counter()
    ttmpl = jax.eval_shape(
        lambda k: t5.init(k, jnp.zeros((1, 8), jnp.int32)), r)['params']
    state = synth_state_from_template(ttmpl, leaf_fn=leaf_fn,
                                        dtype=ml_dtypes.bfloat16)
    n_t5 = sum(int(np.prod(v.shape)) for v in state.values())
    save_file(state, os.path.join(root, 'text_encoder_2',
                                  'model.safetensors'))
    del state, ttmpl
    gc.collect()
    print(f'  t5-xxl: {n_t5 / 1e9:.2f}B params written in '
          f'{time.perf_counter() - t0:.0f}s', file=sys.stderr)
    return root


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    keep = '--keep' in argv
    argv = [a for a in argv if a != '--keep']
    work = argv[0] if argv else '/tmp/bundle_timing'

    from diffusion_feature_tpu import FeatureExtractor

    ckpt = os.path.join(work, 'ckpt')
    bundle = os.path.join(work, 'bundle')
    if not os.path.isfile(os.path.join(
            ckpt, 'transformer', 'diffusion_pytorch_model.safetensors')):
        print('writing full-size synthetic checkpoint...', file=sys.stderr)
        write_fullsize_flux_checkpoint(ckpt)

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
