#!/usr/bin/env python
"""Full-size golden parity: the REAL SD-1.5 U-Net architecture (860M params)
with fixed random torch weights, converted through models/convert.py, one
fp32 forward on each side, EVERY tap value compared.

The tiny-config harness (tests/test_golden_parity.py) pins the block math;
this scales the same oracle to the production architecture, so shape-derived
bugs that only appear at real channel counts / depths (head splits at 8x40,
level-3 no-attention blocks, 4-level skip bookkeeping) are covered too.

Runs the flax side on the default JAX platform (TPU under axon; pass
JAX_PLATFORMS=cpu to force host) and the torch side on CPU.  Not part of
the CPU test suite — a single full-size fp32 compile takes minutes on this
box — run it once per round and record the result in PARITY.md:

    python tools/golden_fullsize.py \
        [1-5|2-1|xl|pgv2|pixart|pixart-alpha|hunyuan|if|flux]

(``flux`` = real-width reduced-depth Flux-dev + int8 fidelity report; full
12B fp32 on both sides at once exceeds host RAM.)

Serving-dtype fidelity mode (VERDICT r4 item 4): ``GOLDEN_DTYPE=bf16``
reruns the flax side in the PRODUCTION configuration — bf16 weights, bf16
activations, default TPU matmul precision — against the same fp32 torch
oracle and reports worst-tap cosine + max-rel-err instead of the fp32
tolerance gate (the reference serves fp16 end-to-end,
/root/reference/extract_feature.py:24; our production default is bf16,
facade.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np

BF16 = os.environ.get('GOLDEN_DTYPE', '').lower() in ('bf16', 'bfloat16')


def serve_dtype():
    """Model/param/input dtype for this run: production bf16 when
    GOLDEN_DTYPE=bf16, else the fp32 oracle dtype."""
    import jax.numpy as jnp
    return jnp.bfloat16 if BF16 else jnp.float32


def compare_and_report(flat, out, ref_taps, ref_out, tol=2e-3):
    if BF16:
        return _report_bf16(flat, out, ref_taps, ref_out)
    worst = ('', 0.0)
    rels = {}
    for k, v in flat.items():
        assert k in ref_taps, f'tap {k} missing from torch oracle'
        r = ref_taps[k].detach().numpy()
        assert v.shape == r.shape, (k, v.shape, r.shape)
        scale = max(np.abs(r).max(), 1e-6)
        rel = float(np.abs(v - r).max() / scale)
        rels[k] = rel
        if rel > worst[1]:
            worst = (k, rel)
    if os.environ.get('GOLDEN_VERBOSE'):
        for k in sorted(rels, key=rels.get, reverse=True)[:15]:
            print(f'  {rels[k]:.2e}  {k}')
    out_rel = float(np.abs(out - ref_out.detach().numpy()).max()
                    / max(np.abs(ref_out.detach().numpy()).max(), 1e-6))
    print(f'checked {len(flat)} taps; worst max-rel-err: '
          f'{worst[1]:.2e} at {worst[0]!r}; model-out: {out_rel:.2e}')
    bad = worst[1] > tol or out_rel > tol
    print('FULLSIZE GOLDEN:', 'FAIL' if bad else 'PASS')
    sys.exit(1 if bad else 0)


def _report_bf16(flat, out, ref_taps, ref_out):
    """bf16-vs-fp32 is dominated by rounding, so the gate is cosine
    fidelity (the int8-flux precedent), with max-rel-err reported for
    context; any family under 0.995 worst-tap cosine fails."""
    worst_cos = ('', 1.0)
    worst_rel = ('', 0.0)
    for k, v in flat.items():
        assert k in ref_taps, f'tap {k} missing from torch oracle'
        r = ref_taps[k].detach().numpy().astype(np.float32)
        assert v.shape == r.shape, (k, v.shape, r.shape)
        vv, rr = v.ravel(), r.ravel()
        denom = float(np.linalg.norm(vv)) * float(np.linalg.norm(rr))
        cos = float(vv @ rr / denom) if denom > 0 else 1.0
        if cos < worst_cos[1]:
            worst_cos = (k, cos)
        rel = float(np.abs(v - r).max() / max(np.abs(r).max(), 1e-6))
        if rel > worst_rel[1]:
            worst_rel = (k, rel)
    ro = ref_out.detach().numpy().astype(np.float32).ravel()
    oo = out.ravel()
    dn = float(np.linalg.norm(oo)) * float(np.linalg.norm(ro))
    out_cos = float(oo @ ro / dn) if dn > 0 else 1.0
    print(f'bf16 serving fidelity over {len(flat)} taps: worst cosine '
          f'{worst_cos[1]:.6f} at {worst_cos[0]!r}; worst max-rel-err '
          f'{worst_rel[1]:.2e} at {worst_rel[0]!r}; model-out cosine '
          f'{out_cos:.6f}')
    bad = worst_cos[1] < 0.995
    print('FULLSIZE GOLDEN (bf16):', 'FAIL' if bad else 'PASS')
    sys.exit(1 if bad else 0)


def run_pixart(which='sigma'):
    """PixArt 512 presets: the full 28-layer / 600M DiT.  ``sigma`` and
    ``alpha`` share the Transformer2DModel ada_norm_single architecture at
    512px (reference feature/components/models.py:87-102 vs :103-118; the
    alpha-only resolution/aspect conditioning exists only in the 1024
    preset) — the alpha mode pins that the preset's config values map and
    convert identically."""
    import torch
    import jax
    import jax.numpy as jnp
    import torch_ref as tr
    from diffusion_feature_tpu.models.dit_pixart import (
        PixArtTransformer2D, PIXART_ALPHA_512, PIXART_SIGMA_512)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    cfg = PIXART_ALPHA_512 if which == 'alpha' else PIXART_SIGMA_512
    tcfg = dict(sample_size=cfg.sample_size, patch_size=cfg.patch_size,
                in_channels=cfg.in_channels, out_channels=cfg.out_channels,
                num_layers=cfg.num_layers,
                num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=cfg.attention_head_dim,
                caption_channels=cfg.caption_channels,
                interpolation_scale=cfg.interpolation_scale)
    torch.manual_seed(0 if which == 'sigma' else 3)
    t0 = time.time()
    ref = tr.PixArtTransformer2DModel(tcfg).eval()
    n = sum(p.numel() for p in ref.parameters())
    print(f'torch PixArt-{which}-512 built: {n/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    dt = serve_dtype()
    ours = PixArtTransformer2D(cfg=cfg, taps=TapSpec.all(), dtype=dt)
    rng = np.random.RandomState(6)
    sample = rng.randn(1, cfg.in_channels, cfg.sample_size,
                       cfg.sample_size).astype(np.float32)
    ctx = rng.randn(1, 30, cfg.caption_channels).astype(np.float32)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: PixArtTransformer2D(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 500.0,
            jnp.asarray(ctx))['params'])
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template,
                                            dtype=dt if BF16 else None)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample, dt),
                                500.0, jnp.asarray(ctx, dt),
                                mutable=['taps', 'attn_store'])
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_taps(tap_state['taps']).items()}
    out = np.asarray(out, np.float32)
    print(f'flax forward on {jax.devices()[0].platform}: '
          f'{len(flat)} taps ({time.time()-t0:.1f}s)')
    ref_taps = {}
    with torch.no_grad():
        ref_out = ref(torch.tensor(sample), 500.0, torch.tensor(ctx),
                      taps=ref_taps)
    compare_and_report(flat, out, ref_taps, ref_out)


def run_hunyuan():
    """HunyuanDiT: the full 40-layer / 1.5B U-ViT DiT."""
    import torch
    import jax
    import jax.numpy as jnp
    import torch_ref as tr
    from diffusion_feature_tpu.models.hunyuan import (
        HunyuanDiT2D, HUNYUAN_DIT, hunyuan_rope)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    cfg = HUNYUAN_DIT
    tcfg = dict(patch_size=cfg.patch_size, in_channels=cfg.in_channels,
                out_channels=cfg.out_channels, hidden_size=cfg.hidden_size,
                num_layers=cfg.num_layers,
                num_attention_heads=cfg.num_attention_heads,
                cross_attention_dim=cfg.cross_attention_dim,
                cross_attention_dim_t5=cfg.cross_attention_dim_t5,
                pooled_projection_dim=cfg.pooled_projection_dim,
                text_len=cfg.text_len, text_len_t5=cfg.text_len_t5,
                mlp_ratio=cfg.mlp_ratio, norm_eps=cfg.norm_eps)
    torch.manual_seed(0)
    t0 = time.time()
    ref = tr.HunyuanDiT2DModel(tcfg).eval()
    n = sum(p.numel() for p in ref.parameters())
    print(f'torch HunyuanDiT built: {n/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    dt = serve_dtype()
    ours = HunyuanDiT2D(cfg=cfg, taps=TapSpec.all(), dtype=dt)
    rng = np.random.RandomState(7)
    lat = 64                      # 512-px latent side
    sample = rng.randn(1, cfg.in_channels, lat, lat).astype(np.float32)
    bert = rng.randn(1, cfg.text_len, cfg.cross_attention_dim
                     ).astype(np.float32)
    t5 = rng.randn(1, cfg.text_len_t5, cfg.cross_attention_dim_t5
                   ).astype(np.float32)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: HunyuanDiT2D(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(bert), None, jnp.asarray(t5), None)['params'])
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template,
                                            dtype=dt if BF16 else None)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample, dt),
                                50.0, jnp.asarray(bert, dt), None,
                                jnp.asarray(t5, dt), None,
                                mutable=['taps', 'attn_store'])
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_taps(tap_state['taps']).items()}
    out = np.asarray(out, np.float32)
    print(f'flax forward on {jax.devices()[0].platform}: '
          f'{len(flat)} taps ({time.time()-t0:.1f}s)')
    gh = lat // cfg.patch_size
    cos_np, sin_np = hunyuan_rope(gh, cfg.head_dim, cfg.rope_base_size)
    ref_taps = {}
    with torch.no_grad():
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(bert),
                      torch.tensor(t5), torch.tensor(cos_np),
                      torch.tensor(sin_np), taps=ref_taps)
    compare_and_report(flat, out, ref_taps, ref_out)


def run_if():
    """DeepFloyd IF-I-L: the full pixel-space U-Net (best-effort preset
    hyperparameters; a real checkpoint adapts via config.json)."""
    import torch
    import jax
    import jax.numpy as jnp
    import torch_ref as tr
    from diffusion_feature_tpu.models.unet_if import IFUNet, IF_I_L
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    cfg = IF_I_L
    tcfg = dict(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        block_out_channels=cfg.block_out_channels,
        down_block_types=cfg.down_block_types,
        up_block_types=cfg.up_block_types,
        layers_per_block=cfg.layers_per_block,
        attention_head_dim=cfg.attention_head_dim,
        cross_attention_dim=cfg.cross_attention_dim,
        encoder_hid_dim=cfg.encoder_hid_dim,
        addition_embed_type_num_heads=cfg.addition_embed_type_num_heads)
    torch.manual_seed(0)
    t0 = time.time()
    ref = tr.IFUNet(tcfg).eval()
    n = sum(p.numel() for p in ref.parameters())
    print(f'torch IF-I-L U-Net built: {n/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    dt = serve_dtype()
    ours = IFUNet(cfg=cfg, taps=TapSpec.all(), dtype=dt)
    rng = np.random.RandomState(8)
    sample = rng.randn(1, 3, cfg.sample_size, cfg.sample_size
                       ).astype(np.float32)
    text = rng.randn(1, 24, cfg.encoder_hid_dim).astype(np.float32)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: IFUNet(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(text))['params'])
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template,
                                            dtype=dt if BF16 else None)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample, dt),
                                50.0, jnp.asarray(text, dt), mutable=['taps'])
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_taps(tap_state['taps']).items()}
    out = np.asarray(out, np.float32)
    print(f'flax forward on {jax.devices()[0].platform}: '
          f'{len(flat)} taps ({time.time()-t0:.1f}s)')
    ref_taps = {}
    with torch.no_grad():
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(text),
                      taps=ref_taps)
    compare_and_report(flat, out, ref_taps, ref_out)


def run_flux():
    """Flux-dev at REAL width, reduced depth (VERDICT r2 item 1).

    Full 12B fp32 is host-RAM-infeasible on both sides at once, but every
    regime that tiny configs mask lives in the *width*, not the depth:
    hidden 3072 / 24 heads / head-dim-128 RoPE with axes (16,56,56), joint
    [text;image] sequence slicing at text_len 512, the dual->single
    handoff.  So this runs genuine Flux-dev dims with 2 dual + 2 single
    blocks (~1.1B params, ~4.4 GiB fp32), weights through the production
    conversion path, every published Flux tap compared — then repeats the
    forward through the production int8 weight-only path (the single-chip
    transformer_8bit configuration) and reports per-tap cosine fidelity at
    real width, which the tiny-model cosine tests cannot establish
    (ADVICE r2: modulation-projection quantization error is amplified
    across the block).

    Match: /root/reference/feature/diffusers/models/transformers/
    transformer_flux.py:107-211, /root/reference/feature/components/
    attention.py:404-527.
    """
    import dataclasses
    import torch
    import jax
    import jax.numpy as jnp
    import torch_ref as tr
    from diffusion_feature_tpu.models.flux import (
        FluxTransformer2D, FLUX_DEV, make_img_ids)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    cfg = dataclasses.replace(FLUX_DEV, num_layers=2, num_single_layers=2)
    text_len = 512
    grid = 32                       # 512-px latents (64) packed 2x2
    tcfg = dict(in_channels=cfg.in_channels, num_layers=cfg.num_layers,
                num_single_layers=cfg.num_single_layers,
                attention_head_dim=cfg.attention_head_dim,
                num_attention_heads=cfg.num_attention_heads,
                joint_attention_dim=cfg.joint_attention_dim,
                pooled_projection_dim=cfg.pooled_projection_dim)
    torch.manual_seed(0)
    t0 = time.time()
    ref = tr.FluxTransformer2DModel(tcfg, text_len=text_len).eval()
    n = sum(p.numel() for p in ref.parameters())
    print(f'torch Flux-dev (real width, 2+2 blocks) built: {n/1e6:.0f}M '
          f'params ({time.time()-t0:.1f}s)')

    rng = np.random.RandomState(9)
    packed = rng.randn(1, grid * grid, cfg.in_channels).astype(np.float32)
    ctx = rng.randn(1, text_len, cfg.joint_attention_dim).astype(np.float32)
    pooled = rng.randn(1, cfg.pooled_projection_dim).astype(np.float32)

    dt = serve_dtype()
    ours = FluxTransformer2D(cfg=cfg, grid_hw=(grid, grid),
                             text_len=text_len, taps=TapSpec.all(),
                             dtype=dt)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: FluxTransformer2D(
            cfg=cfg, grid_hw=(grid, grid), text_len=text_len).init(
                jax.random.PRNGKey(0), jnp.asarray(packed), 500.0,
                jnp.asarray(ctx), jnp.asarray(pooled))['params'])
    state = tr.state_dict_numpy(ref)
    params, _, unused = convert_torch_state(state, template,
                                            dtype=dt if BF16 else None)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(packed, dt),
                                500.0, jnp.asarray(ctx, dt),
                                jnp.asarray(pooled, dt),
                                mutable=['taps', 'attn_store'])
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_taps(tap_state['taps']).items()}
    out = np.asarray(out, np.float32)
    print(f'flax forward on {jax.devices()[0].platform}: '
          f'{len(flat)} taps ({time.time()-t0:.1f}s)')
    del params

    ids = np.concatenate([np.zeros((text_len, 3), np.float32),
                          make_img_ids(grid * 2, grid * 2)], axis=0)
    cos, sin = tr.flux_rope_cos_sin(ids, cfg.axes_dims_rope)
    ref_taps = {}
    t0 = time.time()
    with torch.no_grad():
        ref_out = ref(torch.tensor(packed), 500.0, torch.tensor(ctx),
                      torch.tensor(pooled), cos, sin, taps=ref_taps)
    print(f'torch forward: ({time.time()-t0:.1f}s)')

    # --- int8 weight-only fidelity at real width (production single-chip
    # path: conversion quantizes into the Int8Dense kernel_q/scale leaves) —
    # reported per-tap as cosine vs the fp32 torch oracle
    qcfg = dataclasses.replace(cfg, quantize_int8=True)
    ours_q = FluxTransformer2D(cfg=qcfg, grid_hw=(grid, grid),
                               text_len=text_len, taps=TapSpec.all(),
                               dtype=dt)
    t0 = time.time()
    template_q = jax.eval_shape(
        lambda: FluxTransformer2D(
            cfg=qcfg, grid_hw=(grid, grid), text_len=text_len).init(
                jax.random.PRNGKey(0), jnp.asarray(packed), 500.0,
                jnp.asarray(ctx), jnp.asarray(pooled))['params'])
    params_q, _, unused_q = convert_torch_state(state, template_q,
                                                dtype=dt if BF16 else None)
    assert not unused_q, f'unmapped torch keys (int8): {unused_q[:5]}'
    _, tap_state_q = ours_q.apply(
        {'params': params_q}, jnp.asarray(packed, dt), 500.0,
        jnp.asarray(ctx, dt), jnp.asarray(pooled, dt),
        mutable=['taps', 'attn_store'])
    flat_q = {k: np.asarray(v, np.float32)
              for k, v in flatten_taps(tap_state_q['taps']).items()}
    print(f'int8 forward ({time.time()-t0:.1f}s)')
    worst_q = ('', 1.0)
    for k, v in flat_q.items():
        r = ref_taps[k].detach().numpy().ravel()
        vv = v.ravel()
        denom = np.linalg.norm(vv) * np.linalg.norm(r)
        cosine = float(vv @ r / denom) if denom > 0 else 1.0
        if cosine < worst_q[1]:
            worst_q = (k, cosine)
    print(f'int8 weight-only fidelity: worst tap cosine {worst_q[1]:.4f} '
          f'at {worst_q[0]!r} ({len(flat_q)} taps)')
    if worst_q[1] < 0.98:
        print('FULLSIZE GOLDEN: FAIL (int8 fidelity below 0.98 cosine)')
        sys.exit(1)

    compare_and_report(flat, out, ref_taps, ref_out)


def main():
    import torch
    import jax
    import jax.numpy as jnp

    if not BF16:
        # fp32 oracle runs force fp32-equivalent matmuls on the MXU; the
        # bf16 serving mode keeps the PRODUCTION default precision
        jax.config.update('jax_default_matmul_precision', 'float32')

    import torch_ref as tr
    from diffusion_feature_tpu.models.unet2d import (
        UNet2DConditionModel, SD15_UNET, SD21_UNET, SDXL_UNET)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    model = sys.argv[1] if len(sys.argv) > 1 else '1-5'
    if model in ('pixart', 'pixart-sigma'):
        return run_pixart('sigma')
    if model == 'pixart-alpha':
        return run_pixart('alpha')
    if model == 'hunyuan':
        return run_hunyuan()
    if model == 'if':
        return run_if()
    if model == 'flux':
        return run_flux()
    # pgv2 is the SDXL architecture under a different checkpoint
    # (reference components/models.py:57-70): its golden run is the same
    # tcfg with its own seed/mode name, recorded separately in PARITY.md
    cfg = {'1-5': SD15_UNET, '2-1': SD21_UNET,
           'xl': SDXL_UNET, 'pgv2': SDXL_UNET}[model]
    tcfg = dict(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        block_out_channels=cfg.block_out_channels,
        down_block_types=cfg.down_block_types,
        up_block_types=cfg.up_block_types,
        layers_per_block=cfg.layers_per_block,
        num_attention_heads=cfg.num_attention_heads,
        transformer_layers_per_block=cfg.transformer_layers_per_block,
        cross_attention_dim=cfg.cross_attention_dim,
        use_linear_projection=cfg.use_linear_projection,
        norm_eps=cfg.norm_eps)
    if cfg.addition_embed_type == 'text_time':
        tcfg.update(
            addition_embed_type='text_time',
            addition_time_embed_dim=cfg.addition_time_embed_dim,
            projection_class_embeddings_input_dim=
            cfg.projection_class_embeddings_input_dim)

    # distinct draws per mode (pgv2 shares the xl architecture; its run must
    # still be an independent weight/input sample, not a byte-identical rerun)
    tseed, iseed = {'1-5': (0, 5), 'xl': (0, 5),
                    '2-1': (1, 12), 'pgv2': (2, 13)}[model]
    torch.manual_seed(tseed)
    t0 = time.time()
    ref = tr.UNet2DConditionModel(tcfg).eval()
    n_params = sum(p.numel() for p in ref.parameters())
    print(f'torch {model} U-Net built: {n_params/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    dt = serve_dtype()
    ours = UNet2DConditionModel(cfg=cfg, taps=TapSpec.all(), dtype=dt)
    rng = np.random.RandomState(iseed)
    sample = rng.randn(1, 4, 64, 64).astype(np.float32)
    ctx = rng.randn(1, 77, cfg.cross_attention_dim).astype(np.float32)
    added = added_t = None
    if cfg.addition_embed_type == 'text_time':
        pooled_dim = (cfg.projection_class_embeddings_input_dim
                      - 6 * cfg.addition_time_embed_dim)
        pooled = rng.randn(1, pooled_dim).astype(np.float32)
        s512 = 512.0
        time_ids = np.array([[s512, s512, 0.0, 0.0, s512, s512]], np.float32)
        added = {'text_embeds': jnp.asarray(pooled, dt),
                 'time_ids': jnp.asarray(time_ids, dt)}
        added_t = {'text_embeds': torch.tensor(pooled),
                   'time_ids': torch.tensor(time_ids)}

    t0 = time.time()
    template = jax.eval_shape(
        lambda: UNet2DConditionModel(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(ctx), added)['params'])
    # convert directly into the template's shapes (no full random init pass)
    params, missing, unused = convert_torch_state(
        tr.state_dict_numpy(ref), template, dtype=dt if BF16 else None)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params},
                                jnp.asarray(sample, dt), 50.0,
                                jnp.asarray(ctx, dt), added,
                                mutable=['taps', 'attn_store'])
    flat = {k: np.asarray(v, np.float32)
            for k, v in flatten_taps(tap_state['taps']).items()}
    out = np.asarray(out, np.float32)
    print(f'flax forward on {jax.devices()[0].platform}: '
          f'{len(flat)} taps ({time.time()-t0:.1f}s)')

    t0 = time.time()
    ref_taps = {}
    with torch.no_grad():
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(ctx),
                      added_cond=added_t, taps=ref_taps)
    print(f'torch forward: ({time.time()-t0:.1f}s)')
    compare_and_report(flat, out, ref_taps, ref_out)


if __name__ == '__main__':
    main()
