"""Forward DDIM inversion of a real image up to a target timestep.

Reproduces the reference's ``ddim_inversion``
(feature/components/ddim_inversion.py:7-45): VAE-encode, then iterate the
*inverted* DDIM update over the reversed timestep ladder until ``t >=
stop_at_t``.  The facade calls it with 100 inference steps
(feature/diffusion_feature.py:385) and pauses the feature store during the
loop; here the inversion steps run through a tap-free module so no taps are
sown, and the ladder runs as ONE ``lax.scan`` body inside the jitted
extraction program — the trace/compile cost is a single U-Net forward no
matter how high ``stop_at_t`` climbs (the step count,
ceil(stop_at_t / (1000//num_steps)), only sizes the scanned
coefficient rows).

Numerics note reproduced faithfully: the reference scales the posterior
sample by the hard-coded SD scaling factor 0.18215 regardless of model
(ddim_inversion.py:15); we use the model's own scaling factor via the VAE
module, which is identical for the SD-1.5/2.1 models this path targets.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .schedulers.diffusion import DDIMScheduler
from .models.vae import AutoencoderKL


def ddim_invert(extractor, params, img, prompt_embeds, *, stop_at_t: int,
                rng, num_inference_steps: int = 100):
    """Returns latents at (approximately) noise level ``stop_at_t``.

    ``extractor`` supplies the models and scheduler config; ``params`` is the
    full param tree (so this traces cleanly inside the extraction step fn).
    Only the epsilon-prediction U-Net families use this path, as in the
    reference (SD-1.5/2.1; the facade guards the rest).
    """
    spec = extractor.spec
    vae = extractor.vae
    latents = vae.apply({'params': params['vae']}, img, rng,
                        method=AutoencoderKL.__call__)

    sched = DDIMScheduler(spec.scheduler_config)
    state = sched.set_timesteps(num_inference_steps)
    timesteps = np.asarray(state.timesteps)[::-1]       # ascending
    step_size = sched.config.num_train_timesteps // num_inference_steps
    alphas_cumprod = sched.alphas_cumprod

    # tap-free twin of the instrumented denoiser (feature store paused,
    # reference diffusion_feature.py:384-386)
    plain = type(extractor.unet)(cfg=extractor.unet.cfg, dtype=extractor.dtype)

    # ladder positions actually walked: 1..K where K is the first index
    # whose t reaches stop_at_t (the reference's break-after-update)
    walked = []
    for i in range(1, num_inference_steps):
        t = int(timesteps[i])
        walked.append(t)
        if t >= stop_at_t:
            break
    ts = np.asarray(walked, np.int64)
    current_t = np.maximum(0, ts - step_size)
    a_t = alphas_cumprod[current_t]
    a_next = alphas_cumprod[ts]
    rows = {
        'timestep': ts.astype(np.float32),
        'sqrt_1ma': np.sqrt(1 - a_t).astype(np.float32),
        'ratio': (np.sqrt(a_next) / np.sqrt(a_t)).astype(np.float32),
        'sqrt_1ma_next': np.sqrt(1 - a_next).astype(np.float32),
    }

    def body(latents, row):
        noise_pred = plain.apply({'params': params['unet']}, latents,
                                 row['timestep'], prompt_embeds)
        if noise_pred.shape[1] != latents.shape[1]:
            noise_pred = noise_pred[:, :latents.shape[1]]
        dt = latents.dtype
        # x(t) as a function of x(t-1) (inverted DDIM update,
        # reference ddim_inversion.py:38-41)
        latents = (
            (latents - row['sqrt_1ma'].astype(dt) * noise_pred)
            * row['ratio'].astype(dt)
            + row['sqrt_1ma_next'].astype(dt) * noise_pred
        )
        return latents, None

    latents, _ = jax.lax.scan(body, latents,
                              {k: jnp.asarray(v) for k, v in rows.items()})
    return latents
