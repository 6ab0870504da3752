#!/usr/bin/env python
"""On-chip probe: attention BACKWARD at the seq-16384 bands of 1024² images.

The flash custom VJP switches to the chunked O(sk·chunk)-memory backward
above sq·sk = 8192² (ops/flash_attention._chunked_attention_bwd) because the
one-shot einsum twin's fp32 score temp (b·h·16384²·4 = 1 GiB per b·h) OOMs a
16 GiB v5e at exactly the shapes the forward admits to flash as a memory
necessity (PARITY §6 xl@1024² row). This probe drives jax.grad through
flash_attention at the two REAL 16k shapes on the chip:

  - SD/SDXL level-0 self-attention @1024² images: latent 128² = seq 16384,
    (b, 8 heads, 16384, d 40/64) — the train_unet-at-1024² backward band.
  - VAE mid-block @1024²: (b, 1 head, 16384, d 512) wide-head.

and reports ms/step via the fori_loop + host-readback discipline
(CLAUDE.md). The einsum backward at these shapes is not run — it requests
>16 GiB and would abort the process; its infeasibility is the measured
17.75G-requested OOM already recorded in the xl@1024² PARITY row.

Usage: python tools/grad_16k_probe.py   (on the real chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_grad(b, h, s, d, iters=3):
    import jax
    import jax.numpy as jnp
    from diffusion_feature_tpu.ops.flash_attention import (
        flash_attention, is_flash_compatible)

    assert is_flash_compatible((b, h, s, d), (b, h, s, d))
    scale = d ** -0.5
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, h, s, d), dtype)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale)
                       .astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def run(q):
        def body(i, acc):
            # perturb per iteration so XLA cannot hoist the grad out
            qi = q + (i * 1e-6).astype(dtype)
            gq, gk, gv = grad(qi, qi, qi)
            return acc + jnp.sum(gq.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    acc = float(np.asarray(f(q)))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(acc), acc
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = float(np.asarray(f(q)))
        best.append(time.perf_counter() - t0)
        assert np.isfinite(acc)
    return float(np.median(best)) / iters, compile_s


def main():
    shapes = [
        # d40 (SD-1.5 level-0 heads) pads to the same 64-lane MXU tile,
        # so one d64 probe covers both bands.
        ('sd-level0@1024² (b2,h8,s16384,d64)', (2, 8, 16384, 64)),
        ('vae-mid@1024² wide-head (b2,h1,s16384,d512)', (2, 1, 16384, 512)),
    ]
    for name, (b, h, s, d) in shapes:
        sec, comp = timed_grad(b, h, s, d)
        # einsum-backward score temp this shape would have materialized:
        gib = b * h * s * s * 4 / 2 ** 30
        print(f'{name}: {sec * 1e3:.1f} ms/grad-step (compile {comp:.1f} s; '
              f'one-shot einsum bwd would need {gib:.0f} GiB fp32 scores '
              'twice over)', flush=True)


if __name__ == '__main__':
    main()
