"""Registry-wide layer enumeration without weights or compute.

``enumerate_layers(version, img_size)`` builds the version's denoiser purely
under ``jax.eval_shape`` — parameter shapes included — so the FULL-SIZE
architectures (SDXL, Flux-12B, HunyuanDiT, ...) can be validated for tap
surface and feature shapes in milliseconds on any host.  This goes beyond the
reference's ``--show_all_layers`` (extract_feature.py:102-110), which needs
the real weights loaded and a real forward pass.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .taps import TapSpec, flatten_taps
from .models.registry import get_model_spec


def enumerate_layers(version: str, img_size: int = None,
                     batch_size: int = 1) -> Dict[str, Tuple[int, ...]]:
    """{layer-id: reference-layout feature shape} for every tappable layer."""
    spec = get_model_spec(version)
    img_size = img_size or spec.default_img_size
    vae_scale = (2 ** (len(spec.vae.block_out_channels) - 1)
                 if spec.vae is not None else 1)
    lat = img_size // vae_scale if not spec.is_pixel_space else img_size
    S = jax.ShapeDtypeStruct
    dtype = jnp.float32

    if spec.family == 'flux':
        from .models.flux import FluxTransformer2D
        grid = lat // 2
        model = FluxTransformer2D(cfg=spec.dit, grid_hw=(grid, grid),
                                  text_len=spec.prompt_max_length,
                                  taps=TapSpec.all())
        args = (S((batch_size, grid * grid, spec.dit.in_channels), dtype),
                50.0,
                S((batch_size, spec.prompt_max_length, spec.t5.d_model), dtype),
                S((batch_size, spec.dit.pooled_projection_dim), dtype))
    elif spec.family == 'hunyuan':
        from .models.hunyuan import HunyuanDiT2D
        model = HunyuanDiT2D(cfg=spec.dit, taps=TapSpec.all())
        args = (S((batch_size, spec.dit.in_channels, lat, lat), dtype),
                50.0,
                S((batch_size, spec.dit.text_len,
                   spec.dit.cross_attention_dim), dtype),
                None,
                S((batch_size, spec.dit.text_len_t5,
                   spec.dit.cross_attention_dim_t5), dtype),
                None)
    elif spec.family == 'pixart':
        from .models.dit_pixart import PixArtTransformer2D
        model = PixArtTransformer2D(cfg=spec.dit, taps=TapSpec.all())
        args = (S((batch_size, spec.dit.in_channels, lat, lat), dtype),
                50.0,
                S((batch_size, spec.prompt_max_length, spec.t5.d_model), dtype),
                None)
    elif spec.family == 'if':
        from .models.unet_if import IFUNet
        model = IFUNet(cfg=spec.unet, taps=TapSpec.all())
        args = (S((batch_size, spec.unet.in_channels, lat, lat), dtype),
                50.0,
                S((batch_size, spec.prompt_max_length, spec.t5.d_model), dtype),
                None)
    else:
        from .models.unet2d import UNet2DConditionModel
        model = UNet2DConditionModel(cfg=spec.unet, taps=TapSpec.all())
        added = None
        if spec.unet.addition_embed_type == 'text_time':
            pooled = (spec.text_encoders[-1].projection_dim
                      or spec.text_encoders[-1].hidden_size)
            added = {'text_embeds': S((batch_size, pooled), dtype),
                     'time_ids': S((batch_size, 6), dtype)}
        args = (S((batch_size, spec.unet.in_channels, lat, lat), dtype),
                50.0,
                S((batch_size, 77, spec.unet.cross_attention_dim), dtype),
                added)

    def init_and_run(rng, *a):
        variables = model.init(rng, *a)
        # params only: init's forward already sowed one tap encounter
        return model.apply({'params': variables['params']}, *a,
                           mutable=['taps'])

    _, tap_state = jax.eval_shape(init_and_run, jax.random.PRNGKey(0), *args)
    out = {}
    for k, v in flatten_taps(tap_state['taps']).items():
        shape = v.shape
        if len(shape) == 3:
            side = int(math.sqrt(shape[1]))
            shape = (shape[0], shape[2], side, side)
        out[k] = tuple(int(d) for d in shape)
    return out
