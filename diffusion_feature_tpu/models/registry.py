"""Model zoo registry: version string -> architecture + schedule recipe.

Mirrors the reference's ``get_diffusion_model`` version table
(feature/components/models.py:18-172).  Checkpoints load from *local*
diffusers-format directories (zero-egress environment); absent a weights path,
models initialize deterministically at random — enough for every
shape/flow/sharding contract, not for pretrained feature quality.

``test-sd`` / ``test-xl`` are tiny offline configs used by the test suite.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .unet2d import UNetConfig, SD15_UNET, SD21_UNET, SDXL_UNET, tiny_unet_config
from .vae import VAEConfig, SD_VAE, SDXL_VAE, tiny_vae_config
from .clip_text import (
    CLIPTextConfig, CLIP_VIT_L, OPENCLIP_VIT_H, OPENCLIP_BIGG, tiny_clip_config,
)
from .t5 import T5Config, T5_XXL, tiny_t5_config
from .dit_pixart import (
    PixArtConfig, PIXART_ALPHA_512, PIXART_SIGMA_512, PIXART_SIGMA_1024,
    tiny_pixart_config,
)
from .flux import FluxConfig, FLUX_DEV, tiny_flux_config
from .hunyuan import HunyuanConfig, HUNYUAN_DIT, tiny_hunyuan_config
from .unet_if import IFUNetConfig, IF_I_L, tiny_if_config
from .bert_text import BertConfig, HUNYUAN_BERT, tiny_bert_config
from .vae import FLUX_VAE
from ..schedulers import SchedulerConfig, FlowMatchConfig

SD_SCHED = SchedulerConfig(beta_start=0.00085, beta_end=0.012,
                           beta_schedule='scaled_linear', steps_offset=1)
XL_SCHED = dataclasses.replace(SD_SCHED, timestep_spacing='leading')
PIXART_SCHED = SchedulerConfig(beta_start=0.0001, beta_end=0.02,
                               beta_schedule='linear')
# DeepFloyd IF-I-L scheduler_config.json: dynamic_thresholding_ratio=0.95,
# sample_max_value=1.5 (not the diffusers defaults 0.995/1.0)
IF_SCHED = SchedulerConfig(beta_schedule='squaredcos_cap_v2', beta_start=0.0001,
                           beta_end=0.02, variance_type='learned_range',
                           thresholding=True, dynamic_thresholding_ratio=0.95,
                           sample_max_value=1.5)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    version: str
    family: str                        # 'unet' | 'pixart' | 'hunyuan' | 'flux' | 'if'
    hf_id: str                         # provenance only; no downloads happen
    scheduler: str                     # key into schedulers registry
    scheduler_config: SchedulerConfig
    default_img_size: int
    unet: Optional[UNetConfig] = None
    vae: Optional[VAEConfig] = None
    text_encoders: Tuple[CLIPTextConfig, ...] = ()
    dit: Optional[object] = None       # DiT config (pixart/hunyuan/flux), set later
    is_pixel_space: bool = False       # DeepFloyd-IF
    # which hidden state the pipeline feeds the denoiser:
    #   'final' -> final LN output; 'penultimate' -> hidden_states[-2]
    clip_layer: str = 'final'
    t5: Optional[T5Config] = None      # DiT-family text encoder
    bert: Optional[BertConfig] = None  # HunyuanDiT text encoder
    prompt_max_length: int = 77


_REGISTRY = {}


def register(spec: ModelSpec):
    _REGISTRY[spec.version] = spec
    return spec


register(ModelSpec(
    version='1-5', family='unet',
    hf_id='stable-diffusion-v1-5/stable-diffusion-v1-5',
    scheduler='pndm', scheduler_config=SD_SCHED, default_img_size=512,
    unet=SD15_UNET, vae=SD_VAE, text_encoders=(CLIP_VIT_L,)))

register(ModelSpec(
    version='2-1', family='unet',
    hf_id='stabilityai/stable-diffusion-2-1-base',
    scheduler='euler', scheduler_config=SD_SCHED, default_img_size=512,
    unet=SD21_UNET, vae=SD_VAE, text_encoders=(OPENCLIP_VIT_H,)))

register(ModelSpec(
    version='xl', family='unet',
    hf_id='stabilityai/stable-diffusion-xl-base-1.0',
    scheduler='euler', scheduler_config=XL_SCHED, default_img_size=1024,
    unet=SDXL_UNET, vae=SDXL_VAE,
    text_encoders=(CLIP_VIT_L, OPENCLIP_BIGG), clip_layer='penultimate'))

register(ModelSpec(
    version='pgv2', family='unet',
    hf_id='playgroundai/playground-v2-1024px-aesthetic',
    scheduler='euler', scheduler_config=XL_SCHED, default_img_size=1024,
    unet=SDXL_UNET, vae=SDXL_VAE,
    text_encoders=(CLIP_VIT_L, OPENCLIP_BIGG), clip_layer='penultimate'))

register(ModelSpec(
    version='pixart-alpha', family='pixart',
    hf_id='PixArt-alpha/PixArt-XL-2-512x512',
    scheduler='dpmsolver', scheduler_config=PIXART_SCHED, default_img_size=512,
    dit=PIXART_ALPHA_512, vae=SD_VAE, t5=T5_XXL, prompt_max_length=120))

register(ModelSpec(
    version='pixart-sigma', family='pixart',
    hf_id='PixArt-alpha/PixArt-Sigma-XL-2-1024-MS',
    scheduler='dpmsolver', scheduler_config=PIXART_SCHED, default_img_size=1024,
    dit=PIXART_SIGMA_1024, vae=SDXL_VAE, t5=T5_XXL, prompt_max_length=300))

register(ModelSpec(
    version='pixart-sigma-512', family='pixart',
    hf_id='PixArt-alpha/PixArt-Sigma-XL-2-512-MS',
    scheduler='dpmsolver', scheduler_config=PIXART_SCHED, default_img_size=512,
    dit=PIXART_SIGMA_512, vae=SDXL_VAE, t5=T5_XXL, prompt_max_length=300))

register(ModelSpec(
    version='if', family='if',
    hf_id='DeepFloyd/IF-I-L-v1.0',
    scheduler='ddpm', scheduler_config=IF_SCHED, default_img_size=64,
    unet=IF_I_L, vae=None, t5=T5_XXL, is_pixel_space=True,
    prompt_max_length=77))

# HunyuanDiT-Diffusers scheduler config (DDPM, scaled_linear 0.00085-0.03,
# v-prediction, steps_offset 1)
HUNYUAN_SCHED = SchedulerConfig(beta_start=0.00085, beta_end=0.03,
                                beta_schedule='scaled_linear',
                                prediction_type='v_prediction',
                                steps_offset=1)

register(ModelSpec(
    version='hunyuan', family='hunyuan',
    hf_id='Tencent-Hunyuan/HunyuanDiT-Diffusers',
    scheduler='ddpm', scheduler_config=HUNYUAN_SCHED, default_img_size=1024,
    dit=HUNYUAN_DIT, vae=SDXL_VAE, bert=HUNYUAN_BERT,
    t5=T5Config(vocab_size=250112, d_model=2048, d_ff=5120,
                num_layers=24, num_heads=32, d_kv=64),
    prompt_max_length=77))

register(ModelSpec(
    version='flux', family='flux',
    hf_id='black-forest-labs/FLUX.1-dev',
    scheduler='flowmatch', scheduler_config=FlowMatchConfig(),
    default_img_size=1024,
    dit=FLUX_DEV, vae=FLUX_VAE,
    text_encoders=(CLIP_VIT_L,), t5=T5_XXL, prompt_max_length=512))

# tiny offline test models
register(ModelSpec(
    version='test-sd', family='unet', hf_id='(random-init test model)',
    scheduler='pndm', scheduler_config=SD_SCHED, default_img_size=64,
    unet=tiny_unet_config(cross_dim=32), vae=tiny_vae_config(),
    text_encoders=(tiny_clip_config(32),)))

register(ModelSpec(
    version='test-xl', family='unet', hf_id='(random-init test model)',
    scheduler='euler', scheduler_config=XL_SCHED, default_img_size=64,
    unet=tiny_unet_config(cross_dim=64, with_xl_embeds=True),
    vae=tiny_vae_config(),
    text_encoders=(tiny_clip_config(32), tiny_clip_config(32, projection_dim=32)),
    clip_layer='penultimate'))


register(ModelSpec(
    version='test-pixart', family='pixart', hf_id='(random-init test model)',
    scheduler='dpmsolver', scheduler_config=PIXART_SCHED, default_img_size=64,
    dit=tiny_pixart_config(), vae=tiny_vae_config(), t5=tiny_t5_config(),
    prompt_max_length=24))

register(ModelSpec(
    version='test-if', family='if', hf_id='(random-init test model)',
    scheduler='ddpm', scheduler_config=IF_SCHED, default_img_size=32,
    unet=tiny_if_config(), vae=None, t5=tiny_t5_config(),
    is_pixel_space=True, prompt_max_length=8))

register(ModelSpec(
    version='test-hunyuan', family='hunyuan', hf_id='(random-init test model)',
    scheduler='ddpm', scheduler_config=HUNYUAN_SCHED, default_img_size=64,
    dit=tiny_hunyuan_config(), vae=tiny_vae_config(), bert=tiny_bert_config(),
    t5=tiny_t5_config(), prompt_max_length=8))

register(ModelSpec(
    version='test-flux', family='flux', hf_id='(random-init test model)',
    scheduler='flowmatch', scheduler_config=FlowMatchConfig(),
    default_img_size=64,
    dit=tiny_flux_config(), vae=tiny_vae_config(latent_channels=4),
    text_encoders=(tiny_clip_config(32),), t5=tiny_t5_config(),
    prompt_max_length=16))


def get_model_spec(version: str) -> ModelSpec:
    if version not in _REGISTRY:
        raise KeyError(
            f'unknown model version {version!r}; known: {sorted(_REGISTRY)}')
    return _REGISTRY[version]


def available_versions():
    return sorted(_REGISTRY)
