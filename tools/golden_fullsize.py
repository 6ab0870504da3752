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

    python tools/golden_fullsize.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np


def compare_and_report(flat, out, ref_taps, ref_out, tol=2e-3):
    worst = ('', 0.0)
    for k, v in flat.items():
        assert k in ref_taps, f'tap {k} missing from torch oracle'
        r = ref_taps[k].detach().numpy()
        assert v.shape == r.shape, (k, v.shape, r.shape)
        scale = max(np.abs(r).max(), 1e-6)
        rel = float(np.abs(v - r).max() / scale)
        if rel > worst[1]:
            worst = (k, rel)
    out_rel = float(np.abs(out - ref_out.detach().numpy()).max()
                    / max(np.abs(ref_out.detach().numpy()).max(), 1e-6))
    print(f'checked {len(flat)} taps; worst max-rel-err: '
          f'{worst[1]:.2e} at {worst[0]!r}; model-out: {out_rel:.2e}')
    bad = worst[1] > tol or out_rel > tol
    print('FULLSIZE GOLDEN:', 'FAIL' if bad else 'PASS')
    sys.exit(1 if bad else 0)


def run_pixart():
    """PixArt-Sigma-512: the full 28-layer / 600M DiT."""
    import torch
    import jax
    import jax.numpy as jnp
    import torch_ref as tr
    from diffusion_feature_tpu.models.dit_pixart import (
        PixArtTransformer2D, PIXART_SIGMA_512)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    cfg = PIXART_SIGMA_512
    tcfg = dict(sample_size=cfg.sample_size, patch_size=cfg.patch_size,
                in_channels=cfg.in_channels, out_channels=cfg.out_channels,
                num_layers=cfg.num_layers,
                num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=cfg.attention_head_dim,
                caption_channels=cfg.caption_channels,
                interpolation_scale=cfg.interpolation_scale)
    torch.manual_seed(0)
    t0 = time.time()
    ref = tr.PixArtTransformer2DModel(tcfg).eval()
    n = sum(p.numel() for p in ref.parameters())
    print(f'torch PixArt-Sigma-512 built: {n/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    ours = PixArtTransformer2D(cfg=cfg, taps=TapSpec.all())
    rng = np.random.RandomState(6)
    sample = rng.randn(1, cfg.in_channels, cfg.sample_size,
                       cfg.sample_size).astype(np.float32)
    ctx = rng.randn(1, 30, cfg.caption_channels).astype(np.float32)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: PixArtTransformer2D(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 500.0,
            jnp.asarray(ctx))['params'])
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                500.0, jnp.asarray(ctx),
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

    ours = HunyuanDiT2D(cfg=cfg, taps=TapSpec.all())
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
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                50.0, jnp.asarray(bert), None,
                                jnp.asarray(t5), None,
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

    ours = IFUNet(cfg=cfg, taps=TapSpec.all())
    rng = np.random.RandomState(8)
    sample = rng.randn(1, 3, cfg.sample_size, cfg.sample_size
                       ).astype(np.float32)
    text = rng.randn(1, 24, cfg.encoder_hid_dim).astype(np.float32)
    t0 = time.time()
    template = jax.eval_shape(
        lambda: IFUNet(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(text))['params'])
    params, _, unused = convert_torch_state(tr.state_dict_numpy(ref), template)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                50.0, jnp.asarray(text), mutable=['taps'])
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


def main():
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_default_matmul_precision', 'float32')

    import torch_ref as tr
    from diffusion_feature_tpu.models.unet2d import (
        UNet2DConditionModel, SD15_UNET, SDXL_UNET)
    from diffusion_feature_tpu.models.convert import convert_torch_state
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    model = sys.argv[1] if len(sys.argv) > 1 else '1-5'
    if model == 'pixart':
        return run_pixart()
    if model == 'hunyuan':
        return run_hunyuan()
    if model == 'if':
        return run_if()
    cfg = {'1-5': SD15_UNET, 'xl': SDXL_UNET}[model]
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

    torch.manual_seed(0)
    t0 = time.time()
    ref = tr.UNet2DConditionModel(tcfg).eval()
    n_params = sum(p.numel() for p in ref.parameters())
    print(f'torch {model} U-Net built: {n_params/1e6:.0f}M params '
          f'({time.time()-t0:.1f}s)')

    ours = UNet2DConditionModel(cfg=cfg, taps=TapSpec.all())
    rng = np.random.RandomState(5)
    sample = rng.randn(1, 4, 64, 64).astype(np.float32)
    ctx = rng.randn(1, 77, cfg.cross_attention_dim).astype(np.float32)
    added = added_t = None
    if cfg.addition_embed_type == 'text_time':
        pooled_dim = (cfg.projection_class_embeddings_input_dim
                      - 6 * cfg.addition_time_embed_dim)
        pooled = rng.randn(1, pooled_dim).astype(np.float32)
        s512 = 512.0
        time_ids = np.array([[s512, s512, 0.0, 0.0, s512, s512]], np.float32)
        added = {'text_embeds': jnp.asarray(pooled),
                 'time_ids': jnp.asarray(time_ids)}
        added_t = {'text_embeds': torch.tensor(pooled),
                   'time_ids': torch.tensor(time_ids)}

    t0 = time.time()
    template = jax.eval_shape(
        lambda: UNet2DConditionModel(cfg=cfg).init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(ctx), added)['params'])
    # convert directly into the template's shapes (no full random init pass)
    params, missing, unused = convert_torch_state(
        tr.state_dict_numpy(ref), template)
    assert not unused, f'unmapped torch keys: {unused[:5]}'
    print(f'weights converted ({time.time()-t0:.1f}s)')

    t0 = time.time()
    out, tap_state = ours.apply({'params': params}, jnp.asarray(sample), 50.0,
                                jnp.asarray(ctx), added,
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
