#!/usr/bin/env python
"""Headline benchmark: SDXL-architecture multi-layer feature extraction
throughput (img/s/chip) at 512², the driver's north-star metric
(BASELINE.json: >=8 img/s/chip on v5e).

Measures the full hot path — VAE encode, posterior sample, noise injection,
single U-Net forward with the Ours-XL tap set, feature post-processing.
The steady-state loop runs ON DEVICE inside one jitted ``lax.fori_loop``
(each iteration re-draws the noise and folds every tap tensor into a live
checksum), and the wall clock closes over a host readback of that checksum:
dispatch-latency/async-queue artifacts (large under the axon TPU tunnel,
where block_until_ready does not synchronize) cannot inflate the number.

Modes (BENCH_MODE env):
  all (default)— xl + maps + pixart + flux + hunyuan + if, one JSON line
                 each, with the
                 headline xl line printed LAST and carrying the secondary
                 values as extra fields (``maps_img_per_s`` etc.) — the
                 driver records the final JSON line, which must be the
                 north-star metric, while still capturing every tracked
                 number (VERDICT r2 weak-item 2).
  xl           — the headline SDXL Ours-XL tap set.
  maps         — Ours-XL-t attention-path variant: SD-1.5 15-amalgamation
                 taps + the up_cross attention store (head-mean
                 cross-attention maps + size-band aggregation; the Pallas
                 headmean kernel engages only for kernel-compatible bands,
                 i.e. self-map stores at seq>=512 — cross maps at Sk=77
                 head-mean through the explicit path, which is cheap
                 there).
  pixart       — DiT-family variant: PixArt-Sigma-512 extraction.
  flux         — flagship single-chip path: Flux-dev 12B with int8
                 weight-only block projections (the production
                 transformer_8bit auto-on configuration) at 512².
  hunyuan      — HunyuanDiT 1.5B at its native 1024² (seq-4096 RoPE
                 attention, dual text streams). Part of the 'all' sweep
                 since round 5 (VERDICT r4 item 1) with a reduced
                 iteration count (BENCH_ITERS_HUNYUAN, default 5) so the
                 marginal warm-cache cost stays ~30 s.
  if           — DeepFloyd IF-I-L pixel-space U-Net at 64². Part of the
                 'all' sweep since round 5; nearly free (505 img/s).
  both         — xl + maps.

The xl line additionally reports ``compile_s`` / ``compile_cached_s`` —
wall-clock to build the step executable (first vs immediately-after, the
second hitting the persistent XLA compilation cache) — so compile-time
regressions are tracked per round alongside throughput (VERDICT r2 item 7).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def to_bf16(tree):
    """Cast fp32 leaves to bf16 (store weights at the compute dtype: halves
    HBM traffic; params must stay jit *arguments*, not closure constants,
    or they get baked into the graph)."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def bench_xl(batch, img_size=512):
    """Headline: SDXL + Ours-XL practical taps (config_xl_practical.json)."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.unet2d import UNet2DConditionModel, SDXL_UNET
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SDXL_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import EulerDiscreteScheduler
    from diffusion_feature_tpu.models.registry import XL_SCHED

    dtype = jnp.bfloat16
    taps = TapSpec.from_config({
        'up-level0-repeat0-vit-block7-out': True,
        'up-level0-repeat0-vit-block5-out': True,
        'up-level1-repeat0-vit-block0-cross-q': True,
        'up-level1-repeat0-vit-block0-out': True,
    })
    unet = UNet2DConditionModel(cfg=SDXL_UNET, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=SDXL_VAE, dtype=dtype)
    sched = EulerDiscreteScheduler(XL_SCHED)
    state = sched.set_timesteps(1000)
    timesteps, _ = sched.get_timesteps(state, 1000, 50 / 1000)
    latent_t = timesteps[0]

    lat = img_size // 8
    rng = jax.random.PRNGKey(0)
    sample_img = jnp.zeros((1, 3, img_size, img_size), dtype)
    ctx1 = jnp.zeros((1, 77, 2048), dtype)

    unet_params = UNet2DConditionModel(cfg=SDXL_UNET, dtype=dtype).init(
        rng, jnp.zeros((1, 4, lat, lat), dtype), 50, ctx1,
        {'text_embeds': jnp.zeros((1, 1280), dtype),
         'time_ids': jnp.zeros((1, 6), dtype)})['params']
    vae_params = vae.init(rng, sample_img, method=AutoencoderKL.full_pass)['params']
    unet_params = to_bf16(unet_params)
    vae_params = to_bf16(vae_params)

    def step(unet_params, vae_params, img, ctx, pooled, time_ids, noise_rng):
        r1, r2 = jax.random.split(noise_rng)
        latents = vae.apply({'params': vae_params}, img, r1)
        noise = jax.random.normal(r2, latents.shape, latents.dtype)
        latents = sched.add_noise(state, latents, noise, latent_t)
        lat_in = sched.scale_model_input(state, latents, latent_t)
        _, tap_state = unet.apply(
            {'params': unet_params}, lat_in, float(latent_t), ctx,
            {'text_embeds': pooled, 'time_ids': time_ids}, mutable=['taps'])
        return postprocess_taps(flatten_taps(tap_state['taps']))

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    ctx = jnp.ones((batch, 77, 2048), dtype)
    pooled = jnp.ones((batch, 1280), dtype)
    time_ids = jnp.tile(jnp.asarray(
        [[img_size, img_size, 0, 0, img_size, img_size]], dtype), (batch, 1))
    args = (unet_params, vae_params, img, ctx, pooled, time_ids)
    return step, args


def bench_maps(batch, img_size=512):
    """Attention-path variant (Ours-XL-t third extractor): SD-1.5 with the
    15-amalgamation tap set + the up_cross attention store (head-mean
    score export + size-band aggregation; reference
    components/attention.py)."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.unet2d import UNet2DConditionModel, SD15_UNET
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SD_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import PNDMScheduler
    from diffusion_feature_tpu.models.registry import SD_SCHED
    from diffusion_feature_tpu.configs import resolve_layer_config
    from diffusion_feature_tpu.facade import _aggregate_attention

    dtype = jnp.bfloat16
    taps = TapSpec.from_config(resolve_layer_config('15-amalgamation'))
    # up_cross store band for U-Nets: (img/32, img/16) token-side sizes
    unet = UNet2DConditionModel(cfg=SD15_UNET, dtype=dtype, taps=taps,
                                attn_store_sizes=(img_size // 32,
                                                  img_size // 16))
    vae = AutoencoderKL(cfg=SD_VAE, dtype=dtype)
    sched = PNDMScheduler(SD_SCHED)
    state = sched.set_timesteps(1000)
    timesteps, _ = sched.get_timesteps(state, 1000, 50 / 1000)
    latent_t = int(timesteps[0])

    lat = img_size // 8
    rng = jax.random.PRNGKey(0)
    unet_params = UNet2DConditionModel(cfg=SD15_UNET, dtype=dtype).init(
        rng, jnp.zeros((1, 4, lat, lat), dtype), 50,
        jnp.zeros((1, 77, 768), dtype))['params']
    vae_params = vae.init(rng, jnp.zeros((1, 3, img_size, img_size), dtype),
                          method=AutoencoderKL.full_pass)['params']
    unet_params = to_bf16(unet_params)
    vae_params = to_bf16(vae_params)

    def step(unet_params, vae_params, img, ctx, noise_rng):
        r1, r2 = jax.random.split(noise_rng)
        latents = vae.apply({'params': vae_params}, img, r1)
        noise = jax.random.normal(r2, latents.shape, latents.dtype)
        latents = sched.add_noise(state, latents, noise, latent_t)
        lat_in = sched.scale_model_input(state, latents, latent_t)
        _, tap_state = unet.apply(
            {'params': unet_params}, lat_in, float(latent_t), ctx,
            mutable=['taps', 'attn_store'])
        feats = postprocess_taps(flatten_taps(tap_state['taps']))
        agg = _aggregate_attention(flatten_taps(tap_state['attn_store']),
                                   ['up_cross'], img_size, dtype)
        if agg is not None:
            feats['attn'] = agg
        return feats

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    ctx = jnp.ones((batch, 77, 768), dtype)
    args = (unet_params, vae_params, img, ctx)
    return step, args


def bench_pixart(batch, img_size=512):
    """DiT-family variant: PixArt-Sigma-512 single-step extraction with a
    block-output tap set (seq-1024 transformer, 28 layers, SDXL VAE) — the
    throughput witness that the framework's DiT path is fast, not just the
    U-Nets."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.dit_pixart import (
        PixArtTransformer2D, PIXART_SIGMA_512)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SDXL_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import DPMSolverMultistepScheduler
    from diffusion_feature_tpu.models.registry import PIXART_SCHED

    dtype = jnp.bfloat16
    taps = TapSpec.from_config({
        'vit-block13-out': True,
        'vit-block20-out': True,
        'vit-block20-cross-q': True,
        'vit-block27-out': True,
    })
    dit = PixArtTransformer2D(cfg=PIXART_SIGMA_512, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=SDXL_VAE, dtype=dtype)
    sched = DPMSolverMultistepScheduler(PIXART_SCHED)
    state = sched.set_timesteps(1000)
    timesteps, _ = sched.get_timesteps(state, 1000, 50 / 1000)
    latent_t = float(timesteps[0])

    lat = img_size // 8
    rng = jax.random.PRNGKey(0)
    ctx1 = jnp.zeros((1, 300, 4096), dtype)
    mask1 = jnp.ones((1, 300), jnp.int32)
    dit_params = PixArtTransformer2D(cfg=PIXART_SIGMA_512, dtype=dtype).init(
        rng, jnp.zeros((1, 4, lat, lat), dtype), 50, ctx1, mask1)['params']
    vae_params = vae.init(rng, jnp.zeros((1, 3, img_size, img_size), dtype),
                          method=AutoencoderKL.full_pass)['params']
    dit_params = to_bf16(dit_params)
    vae_params = to_bf16(vae_params)

    def step(dit_params, vae_params, img, ctx, mask, noise_rng):
        r1, r2 = jax.random.split(noise_rng)
        latents = vae.apply({'params': vae_params}, img, r1)
        noise = jax.random.normal(r2, latents.shape, latents.dtype)
        latents = sched.add_noise(state, latents, noise, latent_t)
        lat_in = sched.scale_model_input(state, latents, latent_t)
        _, tap_state = dit.apply(
            {'params': dit_params}, lat_in, latent_t, ctx, mask,
            mutable=['taps'])
        return postprocess_taps(flatten_taps(tap_state['taps']))

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    ctx = jnp.ones((batch, 300, 4096), dtype)
    mask = jnp.ones((batch, 300), jnp.int32)
    args = (dit_params, vae_params, img, ctx, mask)
    return step, args


def bench_flux(batch, img_size=512):
    """Flagship single-chip path: Flux-dev 12B, int8 weight-only block
    projections (the facade's transformer_8bit auto-on configuration for
    real weights on one chip, facade.py:180-205) + Flux VAE encode + 2x2
    packing, text_len 512.  Weights are synthetic (random int8 kernels +
    per-channel scales filled into the production Int8Dense param layout):
    int8/bf16 matmul timing on TPU is value-independent, and the compute
    graph is byte-identical to the converted-checkpoint one
    (models/convert.py quantizes into the same kernel_q/scale leaves)."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.flux import (
        FluxTransformer2D, FLUX_DEV, pack_latents)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, FLUX_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import (
        make_scheduler, FlowMatchConfig)
    from diffusion_feature_tpu.schedulers.flow_match import calculate_shift
    import dataclasses
    import functools as ft

    dtype = jnp.bfloat16
    cfg = dataclasses.replace(FLUX_DEV, quantize_int8=True)
    taps = TapSpec.from_config({
        'vit-block18-out': True,        # last dual block (norm-out quirk)
        'vit-block18-q': True,
        'vit-block37-out': True,        # mid single block
        'vit-block56-out': True,        # last single block
    })
    text_len = 512
    lat = img_size // 8
    grid = lat // 2
    unet = FluxTransformer2D(cfg=cfg, grid_hw=(grid, grid),
                             text_len=text_len, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=FLUX_VAE, dtype=dtype)
    sched = make_scheduler('flowmatch', FlowMatchConfig())
    num_steps = 28
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    mu = calculate_shift(grid * grid, sched.config)
    state = sched.set_timesteps(num_steps, mu=mu, sigmas=sigmas)
    timesteps, _ = sched.get_timesteps(state, num_steps, 50 / 1000)
    latent_t = float(timesteps[0])

    rng = jax.random.PRNGKey(0)
    # init the production param layout via eval_shape (no 12B zero-fill
    # pass), then materialize each leaf with random values of its dtype
    shapes = jax.eval_shape(
        lambda: FluxTransformer2D(
            cfg=cfg, grid_hw=(grid, grid), text_len=text_len,
            dtype=dtype).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, grid * grid, cfg.in_channels), dtype),
                50.0, jnp.zeros((1, text_len, cfg.joint_attention_dim), dtype),
                jnp.zeros((1, cfg.pooled_projection_dim), dtype))['params'])

    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(rng, len(leaves) + 1)

    @ft.partial(jax.jit, static_argnums=(1, 2))
    def fill(key, shape, dt):
        if np.dtype(dt) == np.int8:
            return jax.random.randint(key, shape, -127, 128, jnp.int8)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dt)

    unet_params = jax.tree.unflatten(
        treedef, [fill(k, tuple(s.shape), np.dtype(s.dtype).name)
                  for k, s in zip(keys[1:], leaves)])
    unet_params = to_bf16(unet_params)
    vae_params = to_bf16(vae.init(
        keys[0], jnp.zeros((1, 3, img_size, img_size), dtype),
        method=AutoencoderKL.full_pass)['params'])

    def step(unet_params, vae_params, img, ctx, pooled, noise_rng):
        r1, r2 = jax.random.split(noise_rng)
        latents = vae.apply({'params': vae_params}, img, r1)
        noise = jax.random.normal(r2, latents.shape, latents.dtype)
        latents = sched.scale_noise(state, latents, noise, latent_t)
        packed = pack_latents(latents)
        _, tap_state = unet.apply(
            {'params': unet_params}, packed, latent_t, ctx, pooled,
            mutable=['taps'])
        return postprocess_taps(flatten_taps(tap_state['taps']))

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    ctx = jax.random.normal(rng, (batch, text_len, cfg.joint_attention_dim),
                            dtype) * 0.02
    pooled = jnp.ones((batch, cfg.pooled_projection_dim), dtype)
    args = (unet_params, vae_params, img, ctx, pooled)
    return step, args


def bench_hunyuan(batch, img_size=1024):
    """HunyuanDiT 1.5B extraction at its native 1024² (registry
    default_img_size): patch-2 DiT → 4096 image tokens with 2D RoPE,
    dual text streams (BERT 77×1024 + T5 256×2048), U-ViT long skips.
    Witnesses the seq-4096 attention band where the flash kernel engages."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.hunyuan import HunyuanDiT2D, HUNYUAN_DIT
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SDXL_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import DDPMScheduler
    from diffusion_feature_tpu.models.registry import HUNYUAN_SCHED

    dtype = jnp.bfloat16
    taps = TapSpec.from_config({
        'vit-block13-self-q': True,
        'vit-block20-self-q': True,
        'vit-block27-self-q': True,
        'vit-block39-self-q': True,
    })
    dit = HunyuanDiT2D(cfg=HUNYUAN_DIT, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=SDXL_VAE, dtype=dtype)
    sched = DDPMScheduler(HUNYUAN_SCHED)
    state = sched.set_timesteps(50)
    timesteps, _ = sched.get_timesteps(state, 50, 50 / 1000)
    latent_t = int(timesteps[0])

    lat = img_size // 8
    rng = jax.random.PRNGKey(0)
    bert1 = jnp.zeros((1, 77, 1024), dtype)
    t51 = jnp.zeros((1, 256, 2048), dtype)
    dit_params = HunyuanDiT2D(cfg=HUNYUAN_DIT, dtype=dtype).init(
        rng, jnp.zeros((1, 4, lat, lat), dtype), 50, bert1,
        jnp.ones((1, 77), jnp.int32), t51,
        jnp.ones((1, 256), jnp.int32))['params']
    vae_params = vae.init(rng, jnp.zeros((1, 3, img_size, img_size), dtype),
                          method=AutoencoderKL.full_pass)['params']
    dit_params = to_bf16(dit_params)
    vae_params = to_bf16(vae_params)

    def step(dit_params, vae_params, img, bert, bmask, t5, tmask, noise_rng):
        r1, r2 = jax.random.split(noise_rng)
        latents = vae.apply({'params': vae_params}, img, r1)
        noise = jax.random.normal(r2, latents.shape, latents.dtype)
        latents = sched.add_noise(state, latents, noise, latent_t)
        lat_in = sched.scale_model_input(state, latents, latent_t)
        _, tap_state = dit.apply(
            {'params': dit_params}, lat_in, float(latent_t), bert, bmask,
            t5, tmask, mutable=['taps'])
        return postprocess_taps(flatten_taps(tap_state['taps']))

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    bert = jnp.ones((batch, 77, 1024), dtype)
    bmask = jnp.ones((batch, 77), jnp.int32)
    t5 = jnp.ones((batch, 256, 2048), dtype)
    tmask = jnp.ones((batch, 256), jnp.int32)
    args = (dit_params, vae_params, img, bert, bmask, t5, tmask)
    return step, args


def bench_if(batch, img_size=64):
    """DeepFloyd IF-I-L pixel-space U-Net at its native 64² (no VAE):
    T5-XXL 4096-wide context through AddedKV attention, scale-shift
    resnets. The cheapest family — witnesses that small-spatial pixel
    U-Nets don't fall off a cliff on TPU."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.unet_if import IFUNet, IF_I_L
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.store import postprocess_taps
    from diffusion_feature_tpu.schedulers import DDPMScheduler
    from diffusion_feature_tpu.models.registry import IF_SCHED

    dtype = jnp.bfloat16
    taps = TapSpec.from_config({
        'up-level1-repeat0-res-out': True,
        'up-level2-repeat0-res-out': True,
        'unet-out': True,
    })
    unet = IFUNet(cfg=IF_I_L, dtype=dtype, taps=taps)
    sched = DDPMScheduler(IF_SCHED)
    state = sched.set_timesteps(50)
    timesteps, _ = sched.get_timesteps(state, 50, 50 / 1000)
    latent_t = int(timesteps[0])

    rng = jax.random.PRNGKey(0)
    unet_params = IFUNet(cfg=IF_I_L, dtype=dtype).init(
        rng, jnp.zeros((1, 3, img_size, img_size), dtype), 50,
        jnp.zeros((1, 77, 4096), dtype))['params']
    unet_params = to_bf16(unet_params)

    def step(unet_params, img, ctx, noise_rng):
        noise = jax.random.normal(noise_rng, img.shape, img.dtype)
        noisy = sched.add_noise(state, img, noise, latent_t)
        _, tap_state = unet.apply(
            {'params': unet_params}, noisy, float(latent_t), ctx,
            mutable=['taps'])
        return postprocess_taps(flatten_taps(tap_state['taps']))

    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype) * 2 - 1
    ctx = jnp.ones((batch, 77, 4096), dtype)
    args = (unet_params, img, ctx)
    return step, args


def run_mode(step, args, batch, iters, metric, baseline, img_idx,
             report_compile=False):
    """``img_idx`` names which positional arg is the image batch — the one
    perturbed per iteration so nothing (especially the VAE encode) is
    loop-invariant and hoistable by XLA."""
    import jax
    import jax.numpy as jnp

    def run(*all_args):
        *model_args, rng = all_args

        def body(i, carry):
            rng, acc = carry
            rng, r, rp = jax.random.split(rng, 3)
            # perturb the images per iteration: every batch is new data, so
            # nothing (in particular the VAE encoder) is loop-invariant and
            # hoistable by XLA
            a = list(model_args)
            a[img_idx] = a[img_idx] + jax.random.normal(
                rp, a[img_idx].shape, a[img_idx].dtype) * 0.01
            feats = step(*a, r)
            s = sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())
            return (rng, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (rng, jnp.float32(0)))
        return acc

    full_args = args + (jax.random.PRNGKey(1),)
    compile_fields = {}
    if report_compile:
        # first build: cold unless the persistent XLA cache is warm from a
        # previous round; second build immediately after: always cache-warm
        t0 = time.perf_counter()
        fbench = jax.jit(run).lower(*full_args).compile()
        compile_fields['compile_s'] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        jax.jit(run).lower(*full_args).compile()
        compile_fields['compile_cached_s'] = round(
            time.perf_counter() - t0, 2)
    else:
        fbench = jax.jit(run)
    _ = float(np.asarray(fbench(*full_args)))   # compile + warm run
    t0 = time.perf_counter()
    acc = fbench(*full_args)
    acc = float(np.asarray(acc))                # host readback = hard sync
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)

    img_per_s = batch * iters / dt
    return {
        'metric': metric,
        'value': round(img_per_s, 3),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_per_s / baseline, 3),
        **compile_fields,
    }


def _wait_for_backend(budget_s):
    """Fail fast (with retries) instead of hanging when the TPU tunnel is
    down. On this host the axon plugin pins ``jax_platforms`` at interpreter
    start, and ``jax.devices()`` then blocks *forever* inside PJRT init if the
    relay is unreachable — which would stall the driver's fixed
    ``python bench.py`` invocation indefinitely. Probe device init in a
    subprocess (killable; the in-process call is not) and retry until the
    backend answers or the budget runs out; on exhaustion exit nonzero
    WITHOUT printing a JSON line, so a dead tunnel can never be recorded as
    a 0-throughput headline. Budget via BENCH_BACKEND_WAIT_S (default 240 s
    — shorter than the driver's own patience, so a dead tunnel ends under
    OUR rc with a terminal reason line, not its rc=124 kill).
    """
    import subprocess
    deadline = time.time() + budget_s
    attempt = 0
    fast_failures = 0
    while True:
        attempt += 1
        why = ''
        try:
            # cap each probe to the remaining budget so the LAST probe
            # cannot overrun the deadline by its own 90 s timeout — the
            # whole point of the 240 s default is finishing under OUR rc
            # before the driver's patience runs out
            probe_t = min(90.0, max(10.0, deadline - time.time()))
            out = subprocess.run(
                [sys.executable, '-c',
                 'import jax; print(jax.devices()[0].platform)'],
                capture_output=True, text=True, timeout=probe_t)
            if out.returncode == 0 and out.stdout.strip():
                return out.stdout.strip()
            # a fast nonzero exit is NOT a tunnel symptom (those hang).
            # Usually it's a broken jax install / bad flag that retrying
            # cannot fix — but a RESTARTING tunnel daemon can also refuse
            # connections for a few seconds (fast ECONNREFUSED), so give
            # it 3 strikes (~60 s with the sleeps) before bailing
            why = out.stderr.strip().splitlines()[-8:]
            why = '\nprobe stderr tail:\n' + '\n'.join(why) if why else ''
            fast_failures += 1
            if fast_failures >= 3:
                print('bench: device probe keeps exiting nonzero (not a '
                      'tunnel hang — broken jax install or bad flag); '
                      f'giving up (no JSON emitted){why}', file=sys.stderr)
                sys.exit(1)
        except subprocess.TimeoutExpired:
            fast_failures = 0
            why = ' (probe timed out in device init: tunnel down?)'
        if time.time() >= deadline:
            print(f'bench: device backend unreachable after {attempt} '
                  f'probes; giving up (no JSON emitted){why}',
                  file=sys.stderr)
            sys.exit(1)
        print(f'bench: device backend not ready (probe {attempt}); '
              f'retrying in 30 s{why}', file=sys.stderr)
        time.sleep(30)


def main():
    _wait_for_backend(float(os.environ.get('BENCH_BACKEND_WAIT_S', '240')))
    import jax

    on_tpu = jax.devices()[0].platform == 'tpu'
    batch = int(os.environ.get('BENCH_BATCH', '16' if on_tpu else '1'))
    iters = int(os.environ.get('BENCH_ITERS', '10' if on_tpu else '2'))
    mode = os.environ.get('BENCH_MODE', 'all')

    baseline = 8.0  # img/s/chip north star (BASELINE.json)
    if mode not in ('xl', 'maps', 'pixart', 'flux', 'hunyuan', 'if',
                    'both', 'all'):
        raise ValueError('BENCH_MODE must be xl|maps|pixart|flux|hunyuan|'
                         f'if|both|all, got {mode!r}')
    # The headline xl line prints LAST (the driver records the final JSON
    # line); in 'all' mode the secondary metrics also ride on it as extra
    # fields so one line carries the whole sweep.
    headline = None
    if mode in ('xl', 'both', 'all'):
        # BENCH_IMG overrides the xl resolution for one-off probes (e.g.
        # BENCH_IMG=1024 BENCH_MODE=xl — the reference's flagship
        # correspondence config runs SDXL at 1024²); the driver default
        # stays 512, the north-star resolution
        img_size = int(os.environ.get('BENCH_IMG', '512'))
        step, args = bench_xl(batch, img_size=img_size)
        headline = run_mode(step, args, batch, iters,
                            f'sdxl_{img_size}_feature_extraction_throughput',
                            baseline,
                            img_idx=2,   # (unet_params, vae_params, img, ...)
                            report_compile=True)
    # A measured headline must never be lost to a later secondary-bench
    # crash (flux OOM, tunnel drop): the finally still prints it as the
    # FINAL JSON line — the one the driver records — while the exception
    # propagates to stderr/exit code.
    try:
        if mode in ('maps', 'both', 'all'):
            step = args = None   # drop the previous mode's device buffers
            step, args = bench_maps(batch)
            r = run_mode(step, args, batch, iters,
                         'sd15_512_attention_maps_extraction_throughput',
                         baseline,
                         img_idx=2)      # (unet_params, vae_params, img, ctx)
            print(json.dumps(r))
            if headline:
                headline['maps_img_per_s'] = r['value']
        if mode in ('pixart', 'all'):
            step = args = None   # drop the previous mode's device buffers
            step, args = bench_pixart(batch)
            r = run_mode(step, args, batch, iters,
                         'pixart_sigma_512_feature_extraction_throughput',
                         baseline,
                         img_idx=2)      # (dit_params, vae_params, img, ...)
            print(json.dumps(r))
            if headline:
                headline['pixart_img_per_s'] = r['value']
        if mode in ('flux', 'all'):
            # 12B int8 weights (11.9 GiB) leave ~4 GiB HBM for activations
            # on a 16-GiB v5e: batch stays small
            flux_batch = int(os.environ.get('BENCH_BATCH_FLUX',
                                            '4' if on_tpu else '1'))
            step = args = None   # drop the previous mode's device buffers
            step, args = bench_flux(flux_batch)
            r = run_mode(step, args, flux_batch, iters,
                         'flux_dev_int8_512_feature_extraction_throughput',
                         baseline,
                         img_idx=2)      # (unet_params, vae_params, img, ...)
            print(json.dumps(r))
            if headline:
                headline['flux_int8_img_per_s'] = r['value']
        if mode in ('hunyuan', 'all'):
            # native 1024² → 4096-token attention; 1.5B bf16 params. Batch
            # defaults lower than xl: the 1024² VAE encode dominates HBM.
            # In the 'all' sweep the iteration count drops (default 5):
            # at ~4 img/s a full 10-iter pair would cost ~80 s of the
            # driver's budget for the same number (VERDICT r4 item 1).
            hy_batch = int(os.environ.get('BENCH_BATCH_HUNYUAN',
                                          '8' if on_tpu else '1'))
            hy_iters = (int(os.environ.get('BENCH_ITERS_HUNYUAN',
                                           '5' if on_tpu else '2'))
                        if mode == 'all' else iters)
            step = args = None   # drop the previous mode's device buffers
            step, args = bench_hunyuan(hy_batch)
            r = run_mode(step, args, hy_batch, hy_iters,
                         'hunyuan_dit_1024_feature_extraction_throughput',
                         baseline,
                         img_idx=2)      # (dit_params, vae_params, img, ...)
            print(json.dumps(r))
            if headline:
                headline['hunyuan_img_per_s'] = r['value']
        if mode in ('if', 'all'):
            step = args = None   # drop the previous mode's device buffers
            step, args = bench_if(batch)
            r = run_mode(step, args, batch, iters,
                         'if_i_l_64_feature_extraction_throughput', baseline,
                         img_idx=1)      # (unet_params, img, ctx)
            print(json.dumps(r))
            if headline:
                headline['if_img_per_s'] = r['value']
    finally:
        if headline:
            print(json.dumps(headline))


if __name__ == '__main__':
    main()
