#!/usr/bin/env python
"""On-chip stage timing for the headline bench (SDXL-512 Ours-XL extract).

Times each hot-path stage in isolation inside a jitted fori_loop with a
host-readback sync (the only honest method under the axon tunnel —
CLAUDE.md), so optimization work targets measured milliseconds, not guesses.

Stages: VAE encode / U-Net forward / attention-only sweeps at each (seq,
heads, dim) the SDXL U-Net contains, comparing the Pallas flash kernel vs
the XLA einsum-softmax path at every band.

Usage: python tools/perf_probe.py [stage ...]
  stages: vae unet attn  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, iters):
    """Median-of-3 steady-state seconds for `iters` on-device repeats."""
    import jax
    import jax.numpy as jnp

    def run(*a):
        def body(i, acc):
            out = fn(*a, i)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(run)
    _ = float(np.asarray(f(*args)))    # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = float(np.asarray(f(*args)))
        best.append(time.perf_counter() - t0)
        assert np.isfinite(acc)
    return float(np.median(best)) / iters


def probe_vae(batch=16, iters=10, img_size=512):
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SDXL_VAE

    dtype = jnp.bfloat16
    vae = AutoencoderKL(cfg=SDXL_VAE, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, jnp.zeros((1, 3, img_size, img_size), dtype),
                      method=AutoencoderKL.full_pass)['params']
    params = jax.tree.map(lambda x: x.astype(dtype)
                          if x.dtype == jnp.float32 else x, params)
    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype)

    def step(params, img, i):
        x = img + (i * 1e-6).astype(dtype)
        return vae.apply({'params': params}, x, jax.random.PRNGKey(0))

    dt = timed(step, (params, img), iters)
    print(f'vae_encode b{batch}: {dt*1e3:8.2f} ms  '
          f'({batch/dt:6.1f} img/s)')


def probe_unet(batch=16, iters=10, img_size=512):
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.models.unet2d import (
        UNet2DConditionModel, SDXL_UNET)
    from diffusion_feature_tpu.taps import TapSpec

    dtype = jnp.bfloat16
    lat = img_size // 8
    taps = TapSpec.from_config({
        'up-level0-repeat0-vit-block7-out': True,
        'up-level0-repeat0-vit-block5-out': True,
        'up-level1-repeat0-vit-block0-cross-q': True,
        'up-level1-repeat0-vit-block0-out': True,
    })
    rng = jax.random.PRNGKey(0)
    ctx1 = jnp.zeros((1, 77, 2048), dtype)
    added1 = {'text_embeds': jnp.zeros((1, 1280), dtype),
              'time_ids': jnp.zeros((1, 6), dtype)}
    params = UNet2DConditionModel(cfg=SDXL_UNET, dtype=dtype).init(
        rng, jnp.zeros((1, 4, lat, lat), dtype), 50, ctx1, added1)['params']
    params = jax.tree.map(lambda x: x.astype(dtype)
                          if x.dtype == jnp.float32 else x, params)

    x = jax.random.normal(rng, (batch, 4, lat, lat), dtype)
    ctx = jnp.ones((batch, 77, 2048), dtype)
    added = {'text_embeds': jnp.ones((batch, 1280), dtype),
             'time_ids': jnp.ones((batch, 6), dtype)}

    for label, mdl in (
        ('taps', UNet2DConditionModel(cfg=SDXL_UNET, dtype=dtype, taps=taps)),
        ('plain', UNet2DConditionModel(cfg=SDXL_UNET, dtype=dtype)),
    ):
        if label == 'taps':
            def step(params, x, ctx, i, mdl=mdl):
                out, st = mdl.apply(
                    {'params': params}, x + (i * 1e-6).astype(dtype),
                    50.0, ctx, added, mutable=['taps'])
                leaves = jax.tree_util.tree_leaves(st['taps'])
                return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                           ) + jnp.sum(out.astype(jnp.float32))
        else:
            def step(params, x, ctx, i, mdl=mdl):
                return mdl.apply({'params': params},
                                 x + (i * 1e-6).astype(dtype), 50.0, ctx,
                                 added)
        dt = timed(step, (params, x, ctx), iters)
        print(f'unet_fwd[{label}] b{batch}: {dt*1e3:8.2f} ms  '
              f'({batch/dt:6.1f} img/s)')


def probe_attn(batch=16, iters=50):
    """SDXL-512 attention bands: (heads, seq_q, seq_k, dim_head) x count."""
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.ops.attention import (
        attention_fused_heads, attention_with_probs_heads)

    dtype = jnp.bfloat16
    # (label, H, Sq, Sk, D): SDXL@512 self/cross at each level
    bands = [
        ('lvl1-self', 10, 1024, 1024, 64),
        ('lvl1-cross', 10, 1024, 77, 64),
        ('lvl2-self', 20, 256, 256, 64),
        ('lvl2-cross', 20, 256, 77, 64),
    ]
    rng = jax.random.PRNGKey(0)
    for label, h, sq, sk, d in bands:
        q = jax.random.normal(rng, (batch, h, sq, d), dtype)
        k = jax.random.normal(rng, (batch, h, sk, d), dtype)
        v = jax.random.normal(rng, (batch, h, sk, d), dtype)

        def step_fused(q, k, v, i):
            return attention_fused_heads(q + (i * 1e-6).astype(dtype), k, v)

        def step_xla(q, k, v, i):
            out, _ = attention_with_probs_heads(
                q + (i * 1e-6).astype(dtype), k, v)
            return out

        for name, fn in (('auto', step_fused), ('xla', step_xla)):
            dt = timed(fn, (q, k, v), iters)
            print(f'attn[{label}][{name}] b{batch}: {dt*1e6:9.1f} us')


def main():
    stages = sys.argv[1:] or ['vae', 'unet', 'attn']
    if 'vae' in stages:
        probe_vae()
    if 'unet' in stages:
        probe_unet()
    if 'attn' in stages:
        probe_attn()


if __name__ == '__main__':
    main()
