"""ControlNet: residual conditioning for U-Net feature extraction.

Reference behavior (feature/components/controlnet.py): each requested
controlnet preprocesses the raw image (Canny edges / Midas depth), encodes it
with a ControlNet copy of the U-Net encoder, and the per-skip residuals of
multiple controlnets are *summed* (:126-136); the facade injects them into the
U-Net call as down/mid additional residuals (feature/diffusion_feature.py:446-465).

TPU-native split: image preprocessing (Canny/depth) runs on host at input
time; the ControlNet forward runs *inside* the jitted extraction step so the
residual computation fuses with the U-Net into one XLA program (the reference
runs it as a separate eager torch call).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..taps import EMPTY, TapSpec
from .layers import TimestepEmbedding, timestep_embedding
from .unet2d import CrossAttnDownBlock2D, UNetMidBlock2DCrossAttn, UNetConfig

_zeros_conv = dict(kernel_init=nn.initializers.zeros)


class ControlNetConditioningEmbedding(nn.Module):
    """diffusers ControlNetConditioningEmbedding: conv stack that maps the
    image-space condition (NHWC, [0,1]) down to latent resolution."""
    conditioning_embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name='conv_in')(x)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = nn.Conv(self.block_out_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f'blocks_{2 * i}')(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_out_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f'blocks_{2 * i + 1}')(x)
            x = nn.silu(x)
        return nn.Conv(self.conditioning_embedding_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out', **_zeros_conv)(x)


class ControlNetModel(nn.Module):
    """U-Net encoder copy + zero convs (diffusers ControlNetModel math).

    __call__(sample NCHW latents, timestep, encoder_hidden_states,
    controlnet_cond NCHW image-space, conditioning_scale, added_cond)
    -> (down_block_res_samples tuple of NHWC, mid_block_res_sample NHWC) —
    NHWC to match our U-Net's internal skip layout.
    """
    cfg: UNetConfig
    cond_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 controlnet_cond, conditioning_scale: float = 1.0,
                 added_cond=None):
        cfg = self.cfg
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        cond = jnp.transpose(controlnet_cond, (0, 2, 3, 1)).astype(self.dtype)

        bsz = x.shape[0]
        timesteps = jnp.broadcast_to(
            jnp.asarray(timestep, jnp.float32).reshape(-1), (bsz,))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name='time_embedding')(t_emb)
        if cfg.addition_embed_type == 'text_time':
            time_embeds = timestep_embedding(
                added_cond['time_ids'].reshape(-1), cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift)
            add_embeds = jnp.concatenate(
                [added_cond['text_embeds'].astype(self.dtype),
                 time_embeds.reshape(bsz, -1).astype(self.dtype)], axis=-1)
            emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                          name='add_embedding')(add_embeds)

        context = encoder_hidden_states.astype(self.dtype)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name='conv_in')(x)
        x = x + ControlNetConditioningEmbedding(
            conditioning_embedding_channels=cfg.block_out_channels[0],
            block_out_channels=self.cond_embed_channels,
            dtype=self.dtype, name='controlnet_cond_embedding')(cond)

        skips = [x]
        ch = cfg.block_out_channels[0]
        for level, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[level]
            is_last = level == len(cfg.down_block_types) - 1
            block = CrossAttnDownBlock2D(
                cfg=cfg, level=level, in_channels=ch, out_channels=out_ch,
                add_downsample=not is_last,
                has_attn=btype == 'CrossAttnDownBlock2D',
                dtype=self.dtype, taps=EMPTY,
                name=f'down_blocks_{level}')
            x, outs = block(x, emb, context)
            skips.extend(outs)
            ch = out_ch

        x = UNetMidBlock2DCrossAttn(
            cfg=cfg, channels=cfg.block_out_channels[-1], dtype=self.dtype,
            taps=EMPTY, name='mid_block')(x, emb, context)

        scale = jnp.asarray(conditioning_scale, self.dtype)
        down_res = tuple(
            nn.Conv(s.shape[-1], (1, 1), dtype=self.dtype,
                    name=f'controlnet_down_blocks_{i}', **_zeros_conv)(s) * scale
            for i, s in enumerate(skips))
        mid_res = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                          name='controlnet_mid_block', **_zeros_conv)(x) * scale
        return down_res, mid_res


# --------------------------------------------------------------------- host IO

def canny_edges(img: np.ndarray, low: float = 100.0, high: float = 200.0) -> np.ndarray:
    """Canny edge detector on a (H, W, 3) uint8 array -> (H, W) uint8 {0,255}.

    Pure-numpy equivalent of the reference's ``cv2.Canny(image, 100, 200)``
    (feature/components/controlnet.py:31-34): gaussian smooth, Sobel (L1
    magnitude, as cv2 defaults), quantized-direction non-max suppression,
    hysteresis thresholding.
    """
    gray = img.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)
    # 5x5 gaussian, sigma=1.4 (classic Canny prefilter)
    ax = np.arange(-2, 3, dtype=np.float32)
    g1 = np.exp(-ax ** 2 / (2 * 1.4 ** 2))
    g1 /= g1.sum()
    pad = np.pad(gray, 2, mode='edge')
    sm = np.apply_along_axis(lambda r: np.convolve(r, g1, 'valid'), 1, pad)
    sm = np.apply_along_axis(lambda c: np.convolve(c, g1, 'valid'), 0, sm)

    p = np.pad(sm, 1, mode='edge')
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 2 + p[:-2, 2:] - p[:-2, :-2] + p[2:, 2:] - p[2:, :-2]
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 2 + p[2:, :-2] - p[:-2, :-2] + p[2:, 2:] - p[:-2, 2:]
    mag = np.abs(gx) + np.abs(gy)                      # cv2 L1 default

    ang = np.rad2deg(np.arctan2(gy, gx)) % 180.0
    q = ((ang + 22.5) // 45).astype(np.int32) % 4      # 0:E-W 1:NE 2:N-S 3:NW
    mp = np.pad(mag, 1)
    neighbors = [
        (mp[1:-1, 2:], mp[1:-1, :-2]),
        (mp[:-2, 2:], mp[2:, :-2]),
        (mp[:-2, 1:-1], mp[2:, 1:-1]),
        (mp[:-2, :-2], mp[2:, 2:]),
    ]
    n1 = np.choose(q, [a for a, _ in neighbors])
    n2 = np.choose(q, [b for _, b in neighbors])
    nms = np.where((mag >= n1) & (mag >= n2), mag, 0.0)

    strong = nms >= high
    weak = (nms >= low) & ~strong
    # hysteresis: BFS from strong pixels through weak ones
    edges = strong.copy()
    frontier = strong
    for _ in range(256):
        fp = np.pad(frontier, 1)
        grown = (
            fp[:-2, :-2] | fp[:-2, 1:-1] | fp[:-2, 2:] |
            fp[1:-1, :-2] | fp[1:-1, 2:] |
            fp[2:, :-2] | fp[2:, 1:-1] | fp[2:, 2:]
        )
        new = grown & weak & ~edges
        if not new.any():
            break
        edges |= new
        frontier = new
    return (edges * 255).astype(np.uint8)


def _canny_preprocess(pil_img) -> np.ndarray:
    """PIL -> (3, H, W) float32 in [0,1] edge map (replicated to 3 channels,
    mirroring the reference's channel-stack at controlnet.py:32-34; the
    no-normalize VaeImageProcessor maps uint8 to [0,1], :89-91)."""
    arr = np.asarray(pil_img.convert('RGB'))
    e = canny_edges(arr).astype(np.float32) / 255.0
    return np.stack([e, e, e], axis=0)


class ControlNetSpec:
    """One controlnet: a host preprocessor + a Flax model + its params."""

    def __init__(self, kind: str, unet_cfg: UNetConfig, dtype,
                 preprocessor=None,
                 cond_embed_channels: Tuple[int, ...] = (16, 32, 96, 256),
                 weights_root=None):
        self.kind = kind
        if isinstance(preprocessor, str) and kind != 'depth':
            # a path argument is only meaningful for depth (its estimator
            # checkpoint dir); silently falling back to the builtin
            # preprocessor would ignore the user's input
            raise ValueError(
                f"controlnet kind {kind!r} takes a callable preprocessor, "
                f"not a path ({preprocessor!r}); paths select the depth "
                f"estimator checkpoint for kind='depth'")
        if preprocessor is not None and not isinstance(preprocessor, str):
            self.preprocess = preprocessor
        elif kind in ('canny', 'canny-xl'):
            self.preprocess = _canny_preprocess
        elif kind == 'depth':
            # reference semantics: MidasDetector + sd-controlnet-depth
            # (feature/components/controlnet.py:65-78).  Zero-egress path:
            # load a DPT depth checkpoint from a local dir — either passed
            # explicitly as control=[('depth', '/path/to/depth_estimator')]
            # or found at {weights_root}/depth_estimator like every other
            # checkpoint component.  A callable override still wins.
            import os
            from .depth import DPTDepthEstimator
            depth_dir = preprocessor if isinstance(preprocessor, str) else None
            if depth_dir is None and weights_root is not None:
                cand = os.path.join(weights_root, 'depth_estimator')
                depth_dir = cand if os.path.isdir(cand) else None
            if depth_dir is None:
                raise FileNotFoundError(
                    "depth controlnet needs a local depth estimator: pass "
                    "control=[('depth', '/path/to/depth_estimator')] (a "
                    "transformers-DPT-format dir), put one at "
                    "{weights}/depth_estimator, or supply a callable "
                    "PIL -> (3,H,W) float32 [0,1]")
            self.preprocess = DPTDepthEstimator(depth_dir)
        else:
            raise NotImplementedError(f'controlnet kind {kind!r}')
        self.model = ControlNetModel(cfg=unet_cfg, dtype=dtype,
                                     cond_embed_channels=cond_embed_channels)


class IPAdapter:
    """API-parity stub: the reference declares an IPAdapter class but never
    implements or uses it (feature/components/controlnet.py:81-82)."""


class ControlNetPipeline:
    """Facade-side controlnet manager (reference ControlNetPipeline,
    feature/components/controlnet.py:87-136).  Preprocessing happens here on
    host; the encode + multi-controlnet residual *sum* happens inside the
    jitted step via :meth:`encode_all`."""

    def __init__(self, extractor, choices: Sequence, weights_root=None):
        spec = extractor.spec
        self.dtype = extractor.dtype
        self.img_size = extractor.img_size
        self.nets = []
        rng = jax.random.PRNGKey(7)
        params = []
        lat = extractor.img_size // extractor.vae_scale
        # conditioning embedding must downsample image-space -> latent-space;
        # the stock (16,32,96,256) stack encodes the SD VAE's 8x (3 stages)
        n_stages = max(1, (extractor.vae_scale - 1).bit_length())
        cond_ch = ((16, 32, 96, 256) if n_stages == 3 else
                   tuple([16] + [32 * (2 ** i) for i in range(n_stages)]))
        for c in choices:
            kind, pre = (c if isinstance(c, tuple) else (c, None))
            net = ControlNetSpec(kind, spec.unet, extractor.dtype, pre,
                                 cond_embed_channels=cond_ch,
                                 weights_root=weights_root)
            sample = jnp.zeros((1, spec.unet.in_channels, lat, lat), self.dtype)
            ctx = jnp.zeros((1, 77, spec.unet.cross_attention_dim), self.dtype)
            cond = jnp.zeros((1, 3, extractor.img_size, extractor.img_size),
                             self.dtype)
            added = None
            if spec.unet.addition_embed_type == 'text_time':
                pooled_dim = (spec.text_encoders[-1].projection_dim
                              or spec.text_encoders[-1].hidden_size)
                added = {'text_embeds': jnp.zeros((1, pooled_dim), self.dtype),
                         'time_ids': jnp.zeros((1, 6), self.dtype)}
            p = net.model.init(rng, sample, 50, ctx, cond, 1.0, added)['params']
            if weights_root is not None:
                import os
                from .convert import load_safetensors_dir, convert_torch_state
                cdir = os.path.join(weights_root, f'controlnet_{kind}')
                if os.path.isdir(cdir):
                    p, _, _ = convert_torch_state(
                        load_safetensors_dir(cdir), p, dtype=self.dtype)
            params.append(p)
            self.nets.append(net)
        extractor.params['controlnet'] = params

    def prepare_control_images(self, raw_images, batch_size: int):
        """Host preprocessing: list of PIL -> one (B, 3, S, S) array per
        controlnet, resized to the extraction resolution."""
        from PIL import Image
        out = []
        for net in self.nets:
            conds = []
            for im in raw_images:
                if not hasattr(im, 'convert'):
                    im = Image.fromarray(np.asarray(im, np.uint8))
                im = im.resize((self.img_size, self.img_size), Image.BILINEAR)
                conds.append(net.preprocess(im))
            arr = np.stack(conds)
            if arr.shape[0] == 1 and batch_size > 1:
                arr = np.repeat(arr, batch_size, axis=0)
            out.append(jnp.asarray(arr, self.dtype))
        return tuple(out)

    def tensors_to_pil(self, tensors):
        from PIL import Image
        arr = np.asarray(jnp.clip((tensors + 1) * 127.5, 0, 255), np.uint8)
        return [Image.fromarray(a.transpose(1, 2, 0)) for a in arr]

    def encode_all(self, params_list, latents, t, prompt_embeds, conds,
                   added_cond=None):
        """Run every controlnet and sum residuals (reference :126-136).
        Traced inside the extraction step."""
        down_sum, mid_sum = None, None
        for net, p, cond in zip(self.nets, params_list, conds):
            down, mid = net.model.apply(
                {'params': p}, latents, t, prompt_embeds, cond, 1.0, added_cond)
            if down_sum is None:
                down_sum, mid_sum = list(down), mid
            else:
                down_sum = [a + b for a, b in zip(down_sum, down)]
                mid_sum = mid_sum + mid
        return tuple(down_sum), mid_sum
