"""DPT monocular depth estimator (MiDaS family) in Flax — the preprocessing
model behind the depth ControlNet.

The reference wraps controlnet_aux's MidasDetector, a torch model pulled from
the HF hub at runtime (reference feature/components/controlnet.py:65-78).
This zero-egress build instead implements the DPT architecture (ViT backbone
+ reassemble/fusion neck + depth head, matching transformers
``DPTForDepthEstimation`` numerics for ``model_type='dpt'`` checkpoints such
as Intel/dpt-large) and loads weights from a local ``depth_estimator/``
directory like every other checkpoint component.  Hybrid (ResNet-stem)
variants are rejected with a clear error; the facade keeps the callable
override for custom estimators.

TPU notes: the whole forward is one jitted program per input size; the ViT
runs in NHWC patches with fused attention; the kernel==stride transpose convs
in the reassemble stage are expressed as an einsum pixel-expand (MXU-friendly,
and exactly the non-overlapping ConvTranspose math).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention_fused


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384
    num_channels: int = 3
    layer_norm_eps: float = 1e-12
    backbone_out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    readout_type: str = 'project'

    @staticmethod
    def from_diffusers_config(d: dict) -> 'DPTConfig':
        if d.get('is_hybrid', False) or d.get('backbone_config'):
            raise NotImplementedError(
                'DPT-hybrid (ResNet-stem) depth checkpoints are not '
                'supported; convert a plain-ViT DPT checkpoint (e.g. '
                'Intel/dpt-large layout) or pass a custom depth callable')
        if d.get('readout_type', 'project') != 'project':
            raise NotImplementedError('only readout_type=project is used by '
                                      'the MiDaS/DPT depth checkpoints')
        return DPTConfig(
            hidden_size=d.get('hidden_size', 1024),
            num_hidden_layers=d.get('num_hidden_layers', 24),
            num_attention_heads=d.get('num_attention_heads', 16),
            intermediate_size=d.get('intermediate_size', 4096),
            patch_size=d.get('patch_size', 16),
            image_size=d.get('image_size', 384),
            num_channels=d.get('num_channels', 3),
            layer_norm_eps=d.get('layer_norm_eps', 1e-12),
            backbone_out_indices=tuple(d.get('backbone_out_indices',
                                             (5, 11, 17, 23))),
            neck_hidden_sizes=tuple(d.get('neck_hidden_sizes',
                                          (256, 512, 1024, 1024))),
            reassemble_factors=tuple(d.get('reassemble_factors',
                                           (4, 2, 1, 0.5))),
            fusion_hidden_size=d.get('fusion_hidden_size', 256),
        )


def tiny_dpt_config() -> DPTConfig:
    return DPTConfig(hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=2, intermediate_size=64,
                     patch_size=8, image_size=64,
                     backbone_out_indices=(0, 1, 2, 3),
                     neck_hidden_sizes=(16, 24, 32, 32),
                     reassemble_factors=(4, 2, 1, 0.5),
                     fusion_hidden_size=16)


def _upsample_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear upsample with align_corners=True on NHWC (torch
    F.interpolate(..., align_corners=True) — corner pixels map exactly;
    jax.image.resize implements only the half-pixel convention)."""
    b, h, w, c = x.shape

    def axis_interp(arr, n_in, n_out, axis):
        if n_in == 1:
            reps = [1] * arr.ndim
            reps[axis] = n_out
            return jnp.tile(arr, reps)
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        frac = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        bb = jnp.take(arr, lo + 1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        frac = frac.reshape(shape)
        return a * (1 - frac) + bb * frac

    x = axis_interp(x, h, out_h, 1)
    x = axis_interp(x, w, out_w, 2)
    return x


class ViTBlock(nn.Module):
    """Standard pre-LN ViT encoder block (transformers DPTViTLayer math)."""
    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layernorm_before')(x)
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name='query')(h)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name='key')(h)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name='value')(h)
        attn = attention_fused(q, k, v, cfg.num_attention_heads)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype,
                         name='attn_output')(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layernorm_after')(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name='intermediate')(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.hidden_size, dtype=self.dtype,
                            name='output')(h)


class PreActResidual(nn.Module):
    """relu-conv-relu-conv with residual (DPTPreActResidualLayer)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name='convolution1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name='convolution2')(h)
        return x + h


class DPTDepthModel(nn.Module):
    """__call__(pixel_values (B, 3, H, W), already mean/std-normalized)
    -> inverse depth (B, H/2*...); output spatial size is
    (H // patch * 2^?) — DPT emits at half the input resolution
    (patch/16 * 4-stage fusion * head 2x = H/2 for patch 16)."""
    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        b, H, W, _ = x.shape
        ph, pw = H // cfg.patch_size, W // cfg.patch_size

        # patch + cls + (grid-resized) position embeddings
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name='patch_proj')(x)
        tokens = x.reshape(b, ph * pw, cfg.hidden_size)
        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        n0 = (cfg.image_size // cfg.patch_size) ** 2
        pos = self.param('position_embeddings', nn.initializers.zeros,
                         (1, n0 + 1, cfg.hidden_size))
        grid0 = cfg.image_size // cfg.patch_size
        pos_grid = pos[:, 1:].reshape(1, grid0, grid0, cfg.hidden_size)
        if (ph, pw) != (grid0, grid0):
            # torch interpolates with the default half-pixel convention here
            pos_grid = jax.image.resize(
                pos_grid, (1, ph, pw, cfg.hidden_size), method='bilinear')
        pos_all = jnp.concatenate(
            [pos[:, :1], pos_grid.reshape(1, ph * pw, cfg.hidden_size)], axis=1)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), tokens], axis=1)
        tokens = tokens + pos_all.astype(self.dtype)

        hooks = []
        want = set(cfg.backbone_out_indices)
        for i in range(cfg.num_hidden_layers):
            tokens = ViTBlock(cfg, dtype=self.dtype, name=f'layer_{i}')(tokens)
            if i in want:
                hooks.append(tokens)

        # neck: readout-project + reassemble per hook
        feats = []
        for i, hs in enumerate(hooks):
            cls_tok, patches = hs[:, :1], hs[:, 1:]
            readout = jnp.broadcast_to(cls_tok, patches.shape)
            h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                         name=f'readout_{i}')(
                jnp.concatenate([patches, readout], axis=-1))
            h = nn.gelu(h, approximate=False)
            h = h.reshape(b, ph, pw, cfg.hidden_size)
            ch = cfg.neck_hidden_sizes[i]
            h = nn.Conv(ch, (1, 1), dtype=self.dtype,
                        name=f'reassemble_proj_{i}')(h)
            f = cfg.reassemble_factors[i]
            if f > 1:
                # kernel==stride ConvTranspose as an einsum pixel-expand
                kk = int(f)
                w = self.param(f'reassemble_resize_{i}_kernel',
                               nn.initializers.lecun_normal(),
                               (kk, kk, ch, ch))
                bias = self.param(f'reassemble_resize_{i}_bias',
                                  nn.initializers.zeros, (ch,))
                h = jnp.einsum('bhwc,ijcd->bhiwjd', h,
                               w.astype(self.dtype))
                hh, ww = h.shape[1] * kk, h.shape[3] * kk
                h = h.reshape(b, hh, ww, ch) + bias.astype(self.dtype)
            elif f < 1:
                h = nn.Conv(ch, (3, 3), strides=(int(1 / f),) * 2, padding=1,
                            dtype=self.dtype, name=f'reassemble_resize_{i}')(h)
            h = nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f'neck_conv_{i}')(h)
            feats.append(h)

        # fusion from the deepest feature up (DPTFeatureFusionStage)
        fused = None
        for j, h in enumerate(reversed(feats)):
            if fused is not None:
                if h.shape[1:3] != fused.shape[1:3]:
                    # odd patch grids: the 2x-upsampled carry overshoots the
                    # lateral by one; transformers' DPTFeatureFusionLayer
                    # bilinearly resizes the lateral (align_corners=False)
                    # to the carry's size before residual_layer1
                    h = jax.image.resize(
                        h, (h.shape[0],) + fused.shape[1:3] + (h.shape[3],),
                        method='bilinear').astype(h.dtype)
                fused = fused + PreActResidual(
                    cfg.fusion_hidden_size, dtype=self.dtype,
                    name=f'fusion_{j}_res1')(h)
            else:
                fused = h
            fused = PreActResidual(cfg.fusion_hidden_size, dtype=self.dtype,
                                   name=f'fusion_{j}_res2')(fused)
            fused = _upsample_align_corners(
                fused, fused.shape[1] * 2, fused.shape[2] * 2)
            fused = nn.Conv(cfg.fusion_hidden_size, (1, 1), dtype=self.dtype,
                            name=f'fusion_{j}_proj')(fused)

        # depth head: conv -> 2x (align_corners) -> conv -> relu -> 1x1 -> relu
        h = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3), padding=1,
                    dtype=self.dtype, name='head_conv1')(fused)
        h = _upsample_align_corners(h, h.shape[1] * 2, h.shape[2] * 2)
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name='head_conv2')(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name='head_conv3')(h)
        h = nn.relu(h)
        return h[..., 0]          # (B, H', W') inverse depth


# ----------------------------------------------------------------- conversion
def rename_dpt_keys(state: dict) -> dict:
    """transformers DPTForDepthEstimation state_dict -> our param paths.
    ConvTranspose resize weights are pre-swapped (in,out)->(out,in) so the
    generic OIHW->HWIO transpose lands them at our (k,k,in,out) layout."""
    out = {}
    for k, v in state.items():
        if k.startswith(('dpt.layernorm', 'dpt.pooler')):
            continue    # pooler/final-LN: not used by the depth head
        kk = (k.replace('dpt.embeddings.patch_embeddings.projection.',
                        'patch_proj.')
               .replace('dpt.embeddings.', '')
               .replace('dpt.encoder.layer.', 'layer_')
               .replace('.attention.attention.query.', '.query.')
               .replace('.attention.attention.key.', '.key.')
               .replace('.attention.attention.value.', '.value.')
               .replace('.attention.output.dense.', '.attn_output.')
               .replace('.intermediate.dense.', '.intermediate.')
               .replace('.output.dense.', '.output.')
               .replace('.layernorm_before.', '.layernorm_before.')
               .replace('.layernorm_after.', '.layernorm_after.'))
        if kk.startswith('neck.reassemble_stage.readout_projects.'):
            i = kk.split('.')[3]
            kk = kk.replace(
                f'neck.reassemble_stage.readout_projects.{i}.0.',
                f'readout_{i}.')
        if kk.startswith('neck.reassemble_stage.layers.'):
            i = kk.split('.')[3]
            if '.projection.' in kk:
                kk = f'reassemble_proj_{i}.' + kk.rsplit('.', 1)[1]
            elif '.resize.' in kk:
                leaf = kk.rsplit('.', 1)[1]
                arr = np.asarray(v)
                # factor>1 hooks use ConvTranspose2d (kernel==stride, 2 or 4;
                # weight layout (in,out,k,k)) — pre-swap to (out,in,k,k) so
                # the generic OIHW->HWIO transpose lands at (k,k,in,out);
                # factor<1 is a plain 3x3 stride-2 Conv2d (already OIHW)
                if leaf == 'weight' and arr.ndim == 4 and arr.shape[-1] != 3:
                    v = arr.transpose(1, 0, 2, 3)
                kk = f'reassemble_resize_{i}.{leaf}'
        if kk.startswith('neck.convs.'):
            i = kk.split('.')[2]
            kk = f'neck_conv_{i}.' + kk.rsplit('.', 1)[1]
        if kk.startswith('neck.fusion_stage.layers.'):
            parts = kk.split('.')
            i, rest = parts[3], parts[4:]
            if rest[0] == 'projection':
                kk = f'fusion_{i}_proj.{rest[-1]}'
            else:
                res = 'res1' if rest[0] == 'residual_layer1' else 'res2'
                kk = f'fusion_{i}_{res}.{rest[1]}.{rest[-1]}'
        if kk.startswith('head.head.'):
            idx = kk.split('.')[2]
            conv = {'0': 'head_conv1', '2': 'head_conv2', '4': 'head_conv3'}[idx]
            kk = f'{conv}.' + kk.rsplit('.', 1)[1]
        out[kk] = v
    # fusion stage index: torch layers[j] consumes the reversed features, so
    # indices already align with our fusion_{j} naming
    return out


def convert_dpt_state(state: dict, template):
    """Map a transformers DPT state_dict onto our init'd tree.  The einsum
    pixel-expand params are named ``reassemble_resize_{i}_kernel``/``_bias``
    flat leaves, which the generic normalizer already resolves from
    ``reassemble_resize_{i}.weight`` after the rename's layout pre-swap."""
    from .convert import convert_torch_state
    params, _, unused = convert_torch_state(rename_dpt_keys(state), template)
    return params, unused


# ------------------------------------------------------------------- detector
class DPTDepthEstimator:
    """Host-side MidasDetector replacement: PIL -> (3, H, W) float32 [0,1]
    normalized inverse-depth, matching controlnet_aux's post-processing
    (depth -= min; depth /= max; stacked to 3 channels)."""

    def __init__(self, model_dir: str, dtype=jnp.float32):
        with open(os.path.join(model_dir, 'config.json')) as f:
            cfg = DPTConfig.from_diffusers_config(json.load(f))
        self.cfg = cfg
        self.model = DPTDepthModel(cfg=cfg, dtype=dtype)
        from .convert import load_safetensors_dir
        template = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, cfg.image_size, cfg.image_size), dtype))['params']
        self.params, _ = convert_dpt_state(
            load_safetensors_dir(model_dir), template)
        self._jitted = jax.jit(
            lambda p, x: self.model.apply({'params': p}, x))

    def __call__(self, pil_img) -> np.ndarray:
        from PIL import Image
        size = self.cfg.image_size
        out_w, out_h = pil_img.size
        img = pil_img.convert('RGB').resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0     # mean/std 0.5
        x = jnp.asarray(arr.transpose(2, 0, 1))[None]
        depth = np.asarray(self._jitted(self.params, x), np.float32)[0]
        dmin, dmax = float(depth.min()), float(depth.max())
        depth = (depth - dmin) / max(dmax - dmin, 1e-8)
        depth = np.asarray(Image.fromarray(
            (depth * 255).astype(np.uint8)).resize((out_w, out_h),
                                                   Image.BILINEAR),
            np.float32) / 255.0
        return np.stack([depth, depth, depth], axis=0)
