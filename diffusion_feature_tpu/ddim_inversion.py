"""Forward DDIM inversion of a real image up to a target timestep.

Reproduces the reference's ``ddim_inversion``
(feature/components/ddim_inversion.py:7-45): VAE-encode, then iterate the
*inverted* DDIM update over the reversed timestep ladder until ``t >=
stop_at_t``.  The facade calls it with 100 inference steps
(feature/diffusion_feature.py:385) and pauses the feature store during the
loop; here the inversion steps run through a tap-free module so no taps are
sown and the whole inversion unrolls into the one jitted extraction program
(a static number of U-Net calls: stop_at_t // (1000//num_steps)).

Numerics note reproduced faithfully: the reference scales the posterior
sample by the hard-coded SD scaling factor 0.18215 regardless of model
(ddim_inversion.py:15); we use the model's own scaling factor via the VAE
module, which is identical for the SD-1.5/2.1 models this path targets.
"""

from __future__ import annotations

import numpy as np
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

    for i in range(1, num_inference_steps):
        t = int(timesteps[i])
        noise_pred = plain.apply({'params': params['unet']}, latents,
                                 float(t), prompt_embeds)
        if noise_pred.shape[1] != latents.shape[1]:
            noise_pred = noise_pred[:, :latents.shape[1]]

        current_t = max(0, t - step_size)
        next_t = t
        a_t = float(alphas_cumprod[current_t])
        a_next = float(alphas_cumprod[next_t])
        # x(t) as a function of x(t-1) (inverted DDIM update,
        # reference ddim_inversion.py:38-41)
        latents = (
            (latents - jnp.asarray(np.sqrt(1 - a_t), latents.dtype) * noise_pred)
            * jnp.asarray(np.sqrt(a_next) / np.sqrt(a_t), latents.dtype)
            + jnp.asarray(np.sqrt(1 - a_next), latents.dtype) * noise_pred
        )
        if t >= stop_at_t:
            break

    return latents
