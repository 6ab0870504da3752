#!/usr/bin/env python
"""Real-size Flux.1-dev generation on ONE v5e chip — the sample() path at
flagship scale.

Drives the facade's flux generation program shape (facade._get_sample_fn:
packed-latent rectified-flow Euler under the mu-shifted schedule, guidance
embedding, per-step taps stacked by lax.scan, VAE decode) with the REAL
12B architecture in the production int8 weight-only param layout.  Weights
are synthetic (random int8 kernels + scales in the exact Int8Dense layout
models/convert.py produces — matmul timing is value-independent and the
compute graph is byte-identical to the converted-checkpoint one), staged by
bench.bench_flux's eval_shape filler so no fp32 12B tree ever exists.

Proves: (1) 12B int8 transformer + VAE decode + N-step scan fits a 16-GiB
chip; (2) the flow-match scan sampler compiles and runs at real width;
(3) per-step background-extraction taps are affordable at 12B scale.

Usage:  python tools/flux_generate_onchip.py [steps] [img_size]
Prints one JSON line with seconds/image at the given step count.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(steps=8, img_size=512, batch=1):
    import jax
    import jax.numpy as jnp
    import dataclasses

    import bench
    from diffusion_feature_tpu.models.flux import (
        FluxTransformer2D, FLUX_DEV, pack_latents, unpack_latents)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, FLUX_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps
    from diffusion_feature_tpu.schedulers import make_scheduler, FlowMatchConfig
    from diffusion_feature_tpu.schedulers.flow_match import calculate_shift

    dtype = jnp.bfloat16
    cfg = dataclasses.replace(FLUX_DEV, quantize_int8=True)
    text_len = 512
    lat = img_size // 8
    grid = lat // 2

    # one per-step tap: proves background extraction at 12B scale
    taps = TapSpec.from_config({'vit-block18-out': True})
    unet = FluxTransformer2D(cfg=cfg, grid_hw=(grid, grid),
                             text_len=text_len, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=FLUX_VAE, dtype=dtype)

    # reuse the bench staging (production int8 param layout, eval_shape
    # init — no 12B fp32 tree ever materializes)
    _, (unet_params, vae_params, _, ctx, pooled) = bench.bench_flux(
        batch, img_size=img_size)

    sched = make_scheduler('flowmatch', FlowMatchConfig())
    sigmas = np.linspace(1.0, 1.0 / steps, steps)
    state = sched.set_timesteps(
        steps, mu=calculate_shift(grid * grid, sched.config), sigmas=sigmas)
    plan = {k: jnp.asarray(v) for k, v in sched.scan_plan(state).items()}
    guidance_emb = 3.5 * 1000.0  # FluxPipeline default, transformer units

    def generate(unet_params, vae_params, ctx, pooled, rng):
        latents = pack_latents(jax.random.normal(
            rng, (batch, cfg.in_channels // 4, lat, lat), dtype))

        def body(latents, row):
            out, tap_state = unet.apply(
                {'params': unet_params}, latents, row['timestep'], ctx,
                pooled, guidance=guidance_emb, mutable=['taps'])
            latents, _ = sched.scan_step(row, out, latents, None, None)
            return latents, tap_state.get('taps', {})

        latents, tap_ys = jax.lax.scan(body, latents, plan)
        images = vae.apply(
            {'params': vae_params},
            unpack_latents(latents, lat, lat) / FLUX_VAE.scaling_factor
            + FLUX_VAE.shift_factor,
            method=AutoencoderKL.decode)
        return jnp.clip(images / 2 + 0.5, 0.0, 1.0), tap_ys

    fn = jax.jit(generate)
    t0 = time.perf_counter()
    images, tap_ys = fn(unet_params, vae_params, ctx, pooled,
                        jax.random.PRNGKey(0))
    np.asarray(images)  # host readback = hard sync through the tunnel
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    images, tap_ys = fn(unet_params, vae_params, ctx, pooled,
                        jax.random.PRNGKey(1))
    img_np = np.asarray(images, np.float32)
    dt = time.perf_counter() - t0

    taps_flat = flatten_taps(jax.tree.map(lambda x: x, tap_ys))
    tap_shapes = {k: tuple(np.shape(v[0] if isinstance(v, tuple) else v))
                  for k, v in taps_flat.items()}
    assert np.isfinite(img_np).all()
    print(json.dumps({
        'metric': 'flux_dev_12b_int8_generation',
        'img_size': img_size, 'steps': steps, 'batch': batch,
        's_per_img': round(dt / batch, 3),
        'compile_and_first_s': round(compile_and_first, 1),
        'img_range': [round(float(img_np.min()), 3),
                      round(float(img_np.max()), 3)],
        'per_step_tap_shapes': tap_shapes,
    }))


if __name__ == '__main__':
    a = sys.argv[1:]
    main(steps=int(a[0]) if a else 8,
         img_size=int(a[1]) if len(a) > 1 else 512)
