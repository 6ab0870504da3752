"""Synthesize diffusers-layout checkpoint tensors from our own param
templates (reverse of models/convert.py's structural mapping).

Used by the checkpoint-loading tests and the on-chip smoke
(`KEEP_PLATFORM=1 pytest tests/test_checkpoint_load.py tests/test_quant.py`)
to exercise the full load path — spec adaptation from config.json, torch
state-dict conversion, on-the-fly int8 quantization — without real
downloaded weights (zero-egress environment).

The emitted keys are in convert.py's *normalized* form (no dots in the
module path, '.weight'/'.bias' leaf), which `_normalize_key` maps back to
the template path unchanged; tensors are transposed to torch conventions
(Linear (O,I), Conv OIHW) so `_transpose_for` restores them.
"""

import numpy as np
from flax import traverse_util


def synth_state_from_template(template_params, seed=0, scale=0.05,
                              leaf_fn=None, dtype=np.float32):
    """Emit {torch-style key: np.ndarray} that convert_torch_state maps back
    onto ``template_params`` exactly (random values, NOT the template's).

    ``template_params`` may be an ``eval_shape`` tree (only shapes are
    read).  ``leaf_fn(shape) -> np.ndarray`` overrides value generation —
    the full-size timing tool uses a fast bf16 generator where RandomState
    would take minutes for 12B params."""
    from diffusion_feature_tpu.models.convert import _normalize_key

    rng = np.random.RandomState(seed)
    flat = traverse_util.flatten_dict(template_params)
    state = {}
    for path, leaf in flat.items():
        base = '_'.join(path[:-1])
        kind = path[-1]
        if kind == 'scale' and path[:-1] + ('kernel_q',) in flat:
            continue  # int8 per-channel scale: filled by on-the-fly quantize
        if leaf_fn is not None:
            arr = leaf_fn(np.shape(leaf))
        else:
            arr = rng.randn(*np.shape(leaf)).astype(np.float32) * scale
        if kind == 'kernel':
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
            name = 'weight'
        elif kind == 'kernel_q':
            arr = arr.T          # fp32 (O, I): quantized during conversion
            name = 'weight'
        elif kind == 'bias':
            name = 'bias'
        elif kind in ('scale', 'embedding', 'weight'):
            name = 'weight'      # norm scales / embeddings store as .weight
        else:
            # bare nn.Parameter leaves (e.g. PixArt's scale_shift_table)
            # keep their own name in torch state dicts
            name = kind
        key = f'{base}.{name}' if base else name
        # round-trip guard: the normalized key must resolve to this path
        assert _normalize_key(base) == base, (path, base)
        state[key] = arr if arr.dtype == dtype else arr.astype(dtype)
    return state


def write_sd_checkpoint(root, *, seed=0):
    """Build a tiny SD-family diffusers checkpoint dir: unet (torch_ref
    transcription weights under dotted diffusers keys) + vae (torch_ref
    encoder + synthesized decoder tensors) + CLIP text encoder
    (transformers, shapes differing from the test-sd preset to exercise
    spec adaptation).  Shared by test_checkpoint_load and the CLI dump
    oracle — the oracle reloads these exact tensors into the torch
    modules, so torch.manual_seed determinism is not relied on."""
    import json
    import os
    import re

    import torch
    import jax
    import jax.numpy as jnp
    from flax import traverse_util
    from safetensors.numpy import save_file

    import torch_ref as tr
    from test_golden_parity import TINY_CFG
    from diffusion_feature_tpu.models.vae import AutoencoderKL, tiny_vae_config

    root = str(root)
    torch.manual_seed(seed)
    for comp in ('unet', 'vae', 'text_encoder'):
        os.makedirs(os.path.join(root, comp), exist_ok=True)

    # U-Net: diffusers-format config + torch_ref weights
    ucfg = {k: list(v) if isinstance(v, tuple) else v
            for k, v in TINY_CFG.items()}
    json.dump(ucfg, open(os.path.join(root, 'unet', 'config.json'), 'w'))
    unet = tr.UNet2DConditionModel(dict(TINY_CFG))
    save_file(tr.state_dict_numpy(unet),
              os.path.join(root, 'unet', 'model.safetensors'))

    # VAE: torch_ref encoder + synthesized decoder tensors under HF names
    json.dump(dict(in_channels=3, out_channels=3, latent_channels=4,
                   block_out_channels=[32, 32], layers_per_block=1,
                   scaling_factor=0.18215),
              open(os.path.join(root, 'vae', 'config.json'), 'w'))
    enc = tr.AutoencoderKLEncoder(dict(in_channels=3, latent_channels=4,
                                       block_out_channels=(32, 32),
                                       layers_per_block=1))
    state = tr.state_dict_numpy(enc)
    vae = AutoencoderKL(cfg=tiny_vae_config())
    tmpl = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                    method=AutoencoderKL.full_pass)['params']
    rng = np.random.RandomState(seed)
    for path, leaf in traverse_util.flatten_dict(tmpl).items():
        if path[0] in ('encoder', 'quant_conv'):
            continue
        dotted = re.sub(r'_(\d+)(_|$)', r'.\1.',
                        '.'.join(path[:-1])).replace('..', '.').rstrip('.')
        leafname = 'bias' if path[-1] == 'bias' else 'weight'
        arr = rng.randn(*leaf.shape).astype(np.float32) * 0.05
        if path[-1] == 'kernel':
            arr = (arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T)
        state[f'{dotted}.{leafname}'] = arr
    save_file(state, os.path.join(root, 'vae', 'model.safetensors'))

    # CLIP text encoder whose shapes DIFFER from the test-sd preset
    # (intermediate 64 vs 128) — exercises spec adaptation
    from transformers import CLIPTextConfig, CLIPTextModel
    ccfg = CLIPTextConfig(vocab_size=1000, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=2, max_position_embeddings=77,
                          projection_dim=32)
    cm = CLIPTextModel(ccfg).eval()
    json.dump(ccfg.to_dict(),
              open(os.path.join(root, 'text_encoder', 'config.json'), 'w'))
    save_file({k: v.detach().numpy() for k, v in cm.state_dict().items()},
              os.path.join(root, 'text_encoder', 'model.safetensors'))
    return root


def write_pixart_checkpoint(root, *, seed=0):
    """Build a complete tiny-PixArt diffusers checkpoint directory:
    transformer (Transformer2DModel ada_norm_single schema) + vae +
    text_encoder (T5) — the DiT-family analogue of write_flux_checkpoint,
    used by the KEEP_PLATFORM on-chip convert->extract smoke."""
    import json
    import os

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from diffusion_feature_tpu.models.dit_pixart import (
        PixArtTransformer2D, tiny_pixart_config)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, tiny_vae_config
    from diffusion_feature_tpu.models.t5 import T5EncoderModel, tiny_t5_config

    root = str(root)
    for comp in ('transformer', 'vae', 'text_encoder'):
        os.makedirs(os.path.join(root, comp), exist_ok=True)
    r = jax.random.PRNGKey(0)

    pcfg = tiny_pixart_config()
    json.dump({
        'sample_size': pcfg.sample_size,
        'patch_size': pcfg.patch_size,
        'in_channels': pcfg.in_channels,
        'out_channels': pcfg.out_channels,
        'num_layers': pcfg.num_layers,
        'num_attention_heads': pcfg.num_attention_heads,
        'attention_head_dim': pcfg.attention_head_dim,
        'cross_attention_dim': pcfg.cross_attention_dim,
        'caption_channels': pcfg.caption_channels,
        'interpolation_scale': pcfg.interpolation_scale,
        'norm_type': 'ada_norm_single',
    }, open(os.path.join(root, 'transformer', 'config.json'), 'w'))
    model = PixArtTransformer2D(cfg=pcfg)
    tmpl = model.init(
        r, jnp.zeros((1, pcfg.in_channels, pcfg.sample_size,
                      pcfg.sample_size)),
        500.0, jnp.zeros((1, 8, pcfg.caption_channels)))['params']
    save_file(synth_state_from_template(tmpl, seed=seed),
              os.path.join(root, 'transformer',
                           'diffusion_pytorch_model.safetensors'))

    vcfg = tiny_vae_config()
    json.dump({'in_channels': 3, 'out_channels': 3,
               'latent_channels': vcfg.latent_channels,
               'block_out_channels': list(vcfg.block_out_channels),
               'layers_per_block': vcfg.layers_per_block,
               'scaling_factor': 0.13025},
              open(os.path.join(root, 'vae', 'config.json'), 'w'))
    vae = AutoencoderKL(cfg=vcfg)
    vtmpl = vae.init(r, jnp.zeros((1, 3, 16, 16)),
                     method=AutoencoderKL.full_pass)['params']
    save_file(synth_state_from_template(vtmpl, seed=seed + 1),
              os.path.join(root, 'vae',
                           'diffusion_pytorch_model.safetensors'))

    tcfg = tiny_t5_config()
    json.dump({'vocab_size': tcfg.vocab_size, 'd_model': tcfg.d_model,
               'd_kv': tcfg.d_kv, 'd_ff': tcfg.d_ff,
               'num_layers': tcfg.num_layers, 'num_heads': tcfg.num_heads},
              open(os.path.join(root, 'text_encoder', 'config.json'), 'w'))
    t5 = T5EncoderModel(cfg=tcfg)
    ttmpl = t5.init(r, jnp.zeros((1, 8), jnp.int32))['params']
    save_file(synth_state_from_template(ttmpl, seed=seed + 3),
              os.path.join(root, 'text_encoder', 'model.safetensors'))
    return root


def write_flux_checkpoint(root, *, seed=0, dtype=np.float32, cfgs=None,
                          leaf_fn=None, progress=False):
    """Build a complete Flux diffusers checkpoint directory: transformer +
    vae + text_encoder (CLIP) + text_encoder_2 (T5), each with a config.json
    the facade adapts its specs from.  ``dtype`` is the stored tensor dtype —
    real Flux checkpoints ship bf16 (pass ``ml_dtypes.bfloat16``).

    Defaults write the tiny test checkpoint.  ``cfgs`` overrides the model
    configs — ``dict(flux=, vae=, clip=, t5=, vae_json=<extra VAE
    config.json fields>)`` — which is how tools/bundle_timing.py writes the
    REAL-size Flux-dev/T5-XXL/CLIP-L checkpoint through this same writer
    (one config-schema source, not two).  Param templates come from
    ``jax.eval_shape`` (synth only reads shapes), so no full-size tree is
    ever materialized; ``leaf_fn``/``progress`` exist for the 12B case
    (fast value generation, per-component stderr timing)."""
    import gc
    import json
    import os
    import sys
    import time

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from diffusion_feature_tpu.models.flux import (
        FluxTransformer2D, tiny_flux_config)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, tiny_vae_config
    from diffusion_feature_tpu.models.t5 import T5EncoderModel, tiny_t5_config
    from diffusion_feature_tpu.models.clip_text import (
        CLIPTextModel, tiny_clip_config)

    cfgs = dict(cfgs or {})
    root = str(root)
    for comp in ('transformer', 'vae', 'text_encoder', 'text_encoder_2'):
        os.makedirs(os.path.join(root, comp), exist_ok=True)
    r = jax.random.PRNGKey(0)

    def _save(comp, fname, tmpl_fn, comp_seed):
        tmpl = jax.eval_shape(tmpl_fn, r)['params']
        t0 = time.perf_counter()
        state = synth_state_from_template(tmpl, seed=comp_seed, dtype=dtype,
                                          leaf_fn=leaf_fn)
        n = sum(int(np.prod(v.shape)) for v in state.values())
        save_file(state, os.path.join(root, comp, fname))
        del state, tmpl
        gc.collect()
        if progress:
            print(f'  {comp}: {n / 1e9:.2f}B params written in '
                  f'{time.perf_counter() - t0:.0f}s', file=sys.stderr)

    # transformer (diffusers FluxTransformer2DModel config schema)
    fcfg = cfgs.get('flux') or tiny_flux_config()
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
    _save('transformer', 'diffusion_pytorch_model.safetensors',
          lambda k: model.init(
              k, jnp.zeros((1, 4, fcfg.in_channels)), 500.0,
              jnp.zeros((1, 8, fcfg.joint_attention_dim)),
              jnp.zeros((1, fcfg.pooled_projection_dim))), seed)

    # vae (tiny default: flux-style scaling/shift factors, 4 latent channels
    # so the 2x2 packing yields the transformer's in_channels=16)
    vcfg = cfgs.get('vae') or tiny_vae_config(latent_channels=4)
    vae_json = cfgs.get('vae_json') or {
        'scaling_factor': 0.3611, 'shift_factor': 0.1159,
        'use_quant_conv': True}
    json.dump({'in_channels': 3, 'out_channels': 3,
               'latent_channels': vcfg.latent_channels,
               'block_out_channels': list(vcfg.block_out_channels),
               'layers_per_block': vcfg.layers_per_block, **vae_json},
              open(os.path.join(root, 'vae', 'config.json'), 'w'))
    vae = AutoencoderKL(cfg=vcfg)
    _save('vae', 'diffusion_pytorch_model.safetensors',
          lambda k: vae.init(k, jnp.zeros((1, 3, 16, 16)),
                             method=AutoencoderKL.full_pass), seed + 1)

    # CLIP text encoder (transformers CLIPTextConfig schema)
    ccfg = cfgs.get('clip') or tiny_clip_config()
    json.dump({'vocab_size': ccfg.vocab_size, 'hidden_size': ccfg.hidden_size,
               'intermediate_size': ccfg.intermediate_size,
               'num_hidden_layers': ccfg.num_hidden_layers,
               'num_attention_heads': ccfg.num_attention_heads,
               'max_position_embeddings': ccfg.max_position_embeddings,
               'hidden_act': 'quick_gelu',
               'architectures': ['CLIPTextModel']},
              open(os.path.join(root, 'text_encoder', 'config.json'), 'w'))
    clip = CLIPTextModel(cfg=ccfg)
    _save('text_encoder', 'model.safetensors',
          lambda k: clip.init(k, jnp.zeros((1, 77), jnp.int32)), seed + 2)

    # T5 encoder (transformers T5Config schema)
    tcfg = cfgs.get('t5') or tiny_t5_config()
    json.dump({'vocab_size': tcfg.vocab_size, 'd_model': tcfg.d_model,
               'd_kv': tcfg.d_kv, 'd_ff': tcfg.d_ff,
               'num_layers': tcfg.num_layers, 'num_heads': tcfg.num_heads},
              open(os.path.join(root, 'text_encoder_2', 'config.json'), 'w'))
    t5 = T5EncoderModel(cfg=tcfg)
    _save('text_encoder_2', 'model.safetensors',
          lambda k: t5.init(k, jnp.zeros((1, 8), jnp.int32)), seed + 3)
    return root
