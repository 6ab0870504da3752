"""Cross-framework golden numerical parity: our Flax/JAX blocks vs test-local
torch transcriptions of the reference's diffusers-0.32.2 math (torch_ref.py).

This is the oracle VERDICT round-1 called the single biggest fidelity risk:
fixed random torch weights are mapped through ``models/convert.py`` (the same
code path real checkpoints use) onto our modules, and outputs AND tap values
are compared at fp32.  A weight-conversion transpose, a GroupNorm epsilon, or
a tap placed on the wrong intermediate all fire here.

Reference math provenance (per block):
  ResnetBlock2D            feature/diffusers/models/resnet.py:320-380
  BasicTransformerBlock    feature/diffusers/models/attention.py:589-590
  FeedForward (GEGLU)      feature/diffusers/models/attention.py:1253-1257
  Attention q/k/v/map      feature/diffusers/models/attention_processor.py:1128,3291
                           + feature/components/attention.py:223-247
  Transformer2DModel       feature/diffusers/models/transformers/transformer_2d.py:474-475
  UNet2DConditionModel     feature/diffusers/models/unet/unet_2d_condition.py:1169-1310
  SDXL micro-conditioning  feature/diffusion_feature.py:534-571
  VAE encoder posterior    stock diffusers AutoencoderKL (use_quant_conv=True)
  Euler/PNDM schedulers    stock diffusers (deep-copied per extract,
                           feature/diffusion_feature.py:288-295)
  PixArt DiT               feature/diffusers/models/attention.py:497-594
                           (ada_norm_single branch) + pipeline forward
  Flux MMDiT               feature/diffusers/models/transformers/
                           transformer_flux.py:40-215 (incl. the 'out'
                           gathers-norm quirk) + attention_processor.py:2280
  Hunyuan attention        feature/components/attention.py:294-401
                           (HunyuanAttnStoreProcessor: LN qk-norm, RoPE on
                           q always / k only for self-attention)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_feature_tpu.models.convert import convert_torch_state
from diffusion_feature_tpu.taps import TapSpec, flatten_taps

import torch_ref as tr

torch.manual_seed(0)
ALL = TapSpec.all()


def convert(torch_module, template):
    state = tr.state_dict_numpy(torch_module)
    params, missing, unused = convert_torch_state(state, template)
    assert not unused, f'torch keys not mapped: {unused[:5]}'
    return params


def assert_close(ours, theirs, atol=3e-5, rtol=1e-4, label=''):
    a = np.asarray(ours, np.float32)
    b = theirs.detach().numpy() if isinstance(theirs, torch.Tensor) else np.asarray(theirs)
    assert a.shape == b.shape, f'{label}: shape {a.shape} vs {b.shape}'
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=label)


def compare_taps(flax_taps, torch_taps, atol=3e-5, rtol=1e-4):
    """Every tap the flax model emitted must match the torch oracle's value
    under the same layer id (torch emits cross-k/cross-v too; ours filters)."""
    assert flax_taps, 'no taps captured'
    for key, val in flax_taps.items():
        assert key in torch_taps, f'tap {key} missing from torch oracle'
        assert_close(val, torch_taps[key], atol=atol, rtol=rtol, label=key)


class TestEmbeddings:
    def test_timestep_embedding(self):
        from diffusion_feature_tpu.models.layers import timestep_embedding
        ts = np.array([0.0, 1.0, 50.0, 999.0], np.float32)
        ours = timestep_embedding(jnp.asarray(ts), 64)
        ref = tr.timestep_embedding(torch.tensor(ts), 64)
        assert_close(ours, ref, label='timestep_embedding')
        # odd dim + no flip + freq shift
        ours = timestep_embedding(jnp.asarray(ts), 33, flip_sin_to_cos=False,
                                  downscale_freq_shift=1.0)
        ref = tr.timestep_embedding(torch.tensor(ts), 33, flip_sin_to_cos=False,
                                    downscale_freq_shift=1.0)
        assert_close(ours, ref, label='timestep_embedding odd')

    def test_time_embedding_mlp(self):
        from diffusion_feature_tpu.models.layers import TimestepEmbedding
        ref = tr.TimestepEmbedding(32, 128)
        ours = TimestepEmbedding(128)
        x = np.random.RandomState(0).randn(2, 32).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
        params = convert(ref, template)
        out = ours.apply({'params': params}, jnp.asarray(x))
        assert_close(out, ref(torch.tensor(x)), label='TimestepEmbedding')


class TestGroupNorm:
    @pytest.mark.parametrize('eps', [1e-5, 1e-6])
    def test_groupnorm(self, eps):
        ref = torch.nn.GroupNorm(8, 32, eps=eps)
        with torch.no_grad():
            ref.weight.copy_(torch.rand(32) + 0.5)
            ref.bias.copy_(torch.rand(32) - 0.5)
        ours = nn.GroupNorm(num_groups=8, epsilon=eps)
        x = np.random.RandomState(1).randn(2, 16, 16, 32).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
        params = {'scale': jnp.asarray(ref.weight.detach().numpy()),
                  'bias': jnp.asarray(ref.bias.detach().numpy())}
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, template)
        out = ours.apply({'params': params}, jnp.asarray(x))
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
        assert_close(jnp.transpose(out, (0, 3, 1, 2)), ref_out,
                     label=f'groupnorm eps={eps}')


class TestResnetBlock:
    def test_resnet_block_taps(self):
        """Time-emb add BEFORE norm2 (time_embedding_norm='default') and the
        'increment' tap pre-residual — the exact order resnet.py:344-377 uses."""
        from diffusion_feature_tpu.models.layers import ResnetBlock2D
        ref = tr.ResnetBlock2D(32, 64, temb_dim=128)
        ours = ResnetBlock2D(in_channels=32, out_channels=64, groups=32,
                             taps=ALL, tap_name='res')
        rng = np.random.RandomState(2)
        x = rng.randn(2, 8, 8, 32).astype(np.float32)
        temb = rng.randn(2, 128).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(temb))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    jnp.asarray(temb), mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor(temb), taps=ref_taps, prefix='res-')
        assert_close(jnp.transpose(out, (0, 3, 1, 2)), ref_out, label='res out')
        compare_taps(flatten_taps(tap_state['taps']), ref_taps)


class TestAttention:
    def test_self_attention_qkv_map(self):
        from diffusion_feature_tpu.models.layers import Attention
        ref = tr.Attention(64, heads=4, dim_head=16)
        ours = Attention(query_dim=64, heads=4, dim_head=16, taps=ALL,
                         tap_name='self')
        x = np.random.RandomState(3).randn(2, 25, 64).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x), taps=ref_taps, prefix='self-')
        assert_close(out, ref_out, label='self-attn out')
        compare_taps(flatten_taps(tap_state['taps']), ref_taps)

    def test_cross_attention(self):
        from diffusion_feature_tpu.models.layers import Attention
        ref = tr.Attention(64, heads=4, dim_head=16, cross_dim=48)
        ours = Attention(query_dim=64, heads=4, dim_head=16,
                         cross_attention_dim=48, taps=ALL, tap_name='cross',
                         is_cross=True)
        rng = np.random.RandomState(4)
        x = rng.randn(2, 25, 64).astype(np.float32)
        ctx = rng.randn(2, 7, 48).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    jnp.asarray(ctx), mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x), torch.tensor(ctx), taps=ref_taps,
                      prefix='cross-')
        assert_close(out, ref_out, label='cross-attn out')
        # ours filters cross-k/cross-v at the tap level (reference drops them
        # at store time, feature_extractor.py:38-39)
        flat = flatten_taps(tap_state['taps'])
        assert 'cross-k' not in flat and 'cross-v' not in flat
        compare_taps(flat, ref_taps)


class TestFeedForward:
    def test_geglu_inner_tap(self):
        from diffusion_feature_tpu.models.layers import FeedForward
        ref = tr.FeedForward(64)
        ours = FeedForward(64, taps=ALL, tap_name='ffn')
        x = np.random.RandomState(5).randn(2, 9, 64).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x), taps=ref_taps, prefix='ffn-')
        assert_close(out, ref_out, label='ff out')
        compare_taps(flatten_taps(tap_state['taps']), ref_taps)


class TestBasicTransformerBlock:
    def test_block_out_tap(self):
        from diffusion_feature_tpu.models.layers import BasicTransformerBlock
        ref = tr.BasicTransformerBlock(64, heads=4, dim_head=16, cross_dim=48)
        ours = BasicTransformerBlock(dim=64, heads=4, dim_head=16,
                                     cross_attention_dim=48, taps=ALL,
                                     tap_name='block0')
        rng = np.random.RandomState(6)
        x = rng.randn(2, 16, 64).astype(np.float32)
        ctx = rng.randn(2, 7, 48).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    jnp.asarray(ctx), mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x), torch.tensor(ctx), taps=ref_taps,
                      prefix='block0-')
        assert_close(out, ref_out, label='block out', atol=5e-5)
        compare_taps(flatten_taps(tap_state['taps']), ref_taps, atol=5e-5)


class TestTransformer2D:
    @pytest.mark.parametrize('linear', [False, True])
    def test_vit_out(self, linear):
        from diffusion_feature_tpu.models.layers import Transformer2DModel
        ref = tr.Transformer2DModel(64, heads=4, dim_head=16, depth=2,
                                    cross_dim=48, use_linear_projection=linear)
        ours = Transformer2DModel(in_channels=64, heads=4, dim_head=16,
                                  depth=2, cross_attention_dim=48,
                                  use_linear_projection=linear, taps=ALL,
                                  tap_name='vit')
        rng = np.random.RandomState(7)
        x = rng.randn(2, 4, 4, 64).astype(np.float32)
        ctx = rng.randn(2, 7, 48).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(x),
                                    jnp.asarray(ctx), mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(ctx),
                      taps=ref_taps, prefix='vit-')
        assert_close(jnp.transpose(out, (0, 3, 1, 2)), ref_out,
                     label='vit out', atol=1e-4)
        compare_taps(flatten_taps(tap_state['taps']), ref_taps, atol=1e-4)


TINY_CFG = dict(
    in_channels=4, out_channels=4, block_out_channels=(32, 64),
    down_block_types=('CrossAttnDownBlock2D', 'DownBlock2D'),
    up_block_types=('UpBlock2D', 'CrossAttnUpBlock2D'),
    layers_per_block=1, num_attention_heads=(2, 2),
    transformer_layers_per_block=(1, 1), cross_attention_dim=32,
    use_linear_projection=False, norm_eps=1e-5,
)


class TestUNetGolden:
    def _build(self, with_xl=False):
        from diffusion_feature_tpu.models.unet2d import (
            UNet2DConditionModel, tiny_unet_config)
        cfg = tiny_unet_config(cross_dim=32, with_xl_embeds=with_xl)
        tcfg = dict(TINY_CFG)
        if with_xl:
            tcfg.update(addition_embed_type='text_time',
                        addition_time_embed_dim=cfg.addition_time_embed_dim,
                        projection_class_embeddings_input_dim=
                        cfg.projection_class_embeddings_input_dim)
        ref = tr.UNet2DConditionModel(tcfg)
        ours = UNet2DConditionModel(cfg=cfg, taps=ALL)
        return ref, ours, cfg

    def test_full_unet_every_tap(self):
        """One tiny U-Net forward: final output + EVERY tap id's value
        (res-increment/out, vit/block/ffn/q/k/v/map, down/upsampler, unet-*)
        vs the torch oracle."""
        ref, ours, _ = self._build()
        rng = np.random.RandomState(8)
        sample = rng.randn(2, 4, 16, 16).astype(np.float32)
        ctx = rng.randn(2, 7, 32).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
                             jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                    50.0, jnp.asarray(ctx),
                                    mutable=['taps', 'attn_store'])
        ref_taps = {}
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(ctx),
                      taps=ref_taps)
        assert_close(out, ref_out, label='unet-out', atol=2e-4)
        flat = flatten_taps(tap_state['taps'])
        # the full published surface fires: spot-check the id families exist
        for expected in ('down-level0-repeat0-res-increment',
                         'down-level0-repeat0-vit-block0-self-q',
                         'down-level0-repeat0-vit-block0-cross-map',
                         'down-level0-repeat0-vit-block0-ffn-inner',
                         'down-level0-downsampler-out', 'mid-vit-out',
                         'up-level0-upsampler-out',
                         'up-level1-repeat1-vit-block0-out',
                         'unet-in', 'unet-after-conv-in', 'unet-out'):
            assert expected in flat, f'missing tap {expected}'
        compare_taps(flat, ref_taps, atol=2e-4)

    def test_sdxl_microconditioning(self):
        """text_time added-cond path with the facade's add_time_ids layout
        [h, w, 0, 0, h, w] (reference diffusion_feature.py:534-571)."""
        ref, ours, cfg = self._build(with_xl=True)
        rng = np.random.RandomState(9)
        sample = rng.randn(1, 4, 16, 16).astype(np.float32)
        ctx = rng.randn(1, 7, 32).astype(np.float32)
        pooled_dim = (cfg.projection_class_embeddings_input_dim
                      - 6 * cfg.addition_time_embed_dim)
        pooled = rng.randn(1, pooled_dim).astype(np.float32)
        s = 128.0
        time_ids = np.array([[s, s, 0.0, 0.0, s, s]], np.float32)
        added = {'text_embeds': jnp.asarray(pooled),
                 'time_ids': jnp.asarray(time_ids)}
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
                             jnp.asarray(ctx), added)['params']
        params = convert(ref, template)
        out, _ = ours.apply({'params': params}, jnp.asarray(sample), 50.0,
                            jnp.asarray(ctx), added,
                            mutable=['taps', 'attn_store'])
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(ctx),
                      added_cond={'text_embeds': torch.tensor(pooled),
                                  'time_ids': torch.tensor(time_ids)})
        assert_close(out, ref_out, label='xl unet-out', atol=2e-4)


class TestControlNetGolden:
    def test_residuals_match_torch(self):
        """ControlNet encoder copy + zero-conv residual heads vs the torch
        transcription (reference wraps diffusers ControlNetModel,
        feature/components/controlnet.py:13-24; residual injection at
        feature/diffusion_feature.py:446-465).  Random weights stand in for
        the zero-init so the projections are exercised."""
        from diffusion_feature_tpu.models.controlnet import ControlNetModel
        from diffusion_feature_tpu.models.unet2d import tiny_unet_config
        cfg = tiny_unet_config(cross_dim=32)
        ref = tr.ControlNetModel(dict(TINY_CFG), cond_blocks=(8, 16, 16, 32))
        ours = ControlNetModel(cfg=cfg, cond_embed_channels=(8, 16, 16, 32))

        rng = np.random.RandomState(12)
        sample = rng.randn(2, 4, 16, 16).astype(np.float32)
        ctx = rng.randn(2, 7, 32).astype(np.float32)
        cond = rng.rand(2, 3, 128, 128).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
                             jnp.asarray(ctx), jnp.asarray(cond),
                             0.75)['params']
        params = convert(ref, template)
        down_o, mid_o = ours.apply({'params': params}, jnp.asarray(sample),
                                   50.0, jnp.asarray(ctx), jnp.asarray(cond),
                                   0.75)
        down_r, mid_r = ref(torch.tensor(sample), 50.0, torch.tensor(ctx),
                            torch.tensor(cond), scale=0.75)
        assert len(down_o) == len(down_r)
        for i, (a, b) in enumerate(zip(down_o, down_r)):
            # ours returns NHWC (the U-Net's internal skip layout)
            assert_close(jnp.transpose(a, (0, 3, 1, 2)), b, atol=2e-4,
                         label=f'down residual {i}')
        assert_close(jnp.transpose(mid_o, (0, 3, 1, 2)), mid_r, atol=2e-4,
                     label='mid residual')


class TestVAEGolden:
    def test_encoder_posterior(self):
        """Encoder + quant_conv moments, then the DiagonalGaussian sample and
        prepare_latents scaling with a fixed noise draw."""
        from diffusion_feature_tpu.models.vae import (
            AutoencoderKL, tiny_vae_config)
        cfg = tiny_vae_config()
        tcfg = dict(in_channels=3, latent_channels=cfg.latent_channels,
                    block_out_channels=cfg.block_out_channels,
                    layers_per_block=cfg.layers_per_block)
        ref = tr.AutoencoderKLEncoder(tcfg)
        ours = AutoencoderKL(cfg=cfg)
        img = np.random.RandomState(10).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
        full = ours.init(jax.random.PRNGKey(0), jnp.asarray(img),
                         method=AutoencoderKL.full_pass)['params']
        sub = {'encoder': full['encoder'], 'quant_conv': full['quant_conv']}
        sub = convert(ref, sub)
        params = dict(full)
        params.update(sub)
        moments = ours.apply({'params': params}, jnp.asarray(img),
                             method=AutoencoderKL.encode_moments)
        ref_moments = ref(torch.tensor(img))
        assert_close(moments, ref_moments, label='vae moments', atol=1e-4)

        # posterior sample + scaling (prepare_latents semantics): same
        # arithmetic both sides from the compared moments
        m = ref_moments.detach().numpy()
        mean, logvar = np.split(m, 2, axis=1)
        noise = np.random.RandomState(11).randn(*mean.shape).astype(np.float32)
        std = np.exp(0.5 * np.clip(logvar, -30.0, 20.0))
        z_ref = (mean + std * noise) * cfg.scaling_factor
        ours_m = np.asarray(moments)
        mean_o, logvar_o = np.split(ours_m, 2, axis=1)
        z_ours = (mean_o + np.exp(0.5 * np.clip(logvar_o, -30, 20)) * noise) \
            * cfg.scaling_factor
        np.testing.assert_allclose(z_ours, z_ref, atol=2e-4, rtol=1e-4)


class TestVAEDecoderGolden:
    def test_decode_matches_torch(self):
        """post_quant_conv + decoder vs the torch transcription — the
        'vae-out' pseudo-layer runs scheduler.step + vae.decode
        (feature/diffusion_feature.py:477-485), so decoder numerics gate
        that feature id."""
        from diffusion_feature_tpu.models.vae import (
            AutoencoderKL, tiny_vae_config)
        cfg = tiny_vae_config()
        tcfg = dict(in_channels=3, out_channels=3,
                    latent_channels=cfg.latent_channels,
                    block_out_channels=cfg.block_out_channels,
                    layers_per_block=cfg.layers_per_block)
        ref = tr.AutoencoderKLDecoder(tcfg)
        ours = AutoencoderKL(cfg=cfg)
        z = np.random.RandomState(13).randn(1, cfg.latent_channels, 8, 8
                                            ).astype(np.float32)
        full = ours.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, 32, 32), jnp.float32),
                         method=AutoencoderKL.full_pass)['params']
        sub = {'decoder': full['decoder'],
               'post_quant_conv': full['post_quant_conv']}
        sub = convert(ref, sub)
        params = dict(full)
        params.update(sub)
        img = ours.apply({'params': params}, jnp.asarray(z),
                         method=AutoencoderKL.decode)
        ref_img = ref(torch.tensor(z))
        assert_close(img, ref_img, label='vae decode', atol=2e-4)


class TestSchedulerGolden:
    """Independent transcriptions of the stock diffusers schedulers the
    reference deep-copies per extract (diffusion_feature.py:288-295)."""

    def _betas(self):
        return np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                           dtype=np.float64) ** 2

    def test_euler_sigmas_add_noise_scale(self):
        from diffusion_feature_tpu.schedulers.diffusion import (
            EulerDiscreteScheduler, SchedulerConfig)
        sched = EulerDiscreteScheduler(SchedulerConfig(
            timestep_spacing='linspace'))
        state = sched.set_timesteps(1000)
        # diffusers EulerDiscreteScheduler.set_timesteps transcription
        alphas_cumprod = np.cumprod(1.0 - self._betas())
        sigmas_train = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
        timesteps = np.linspace(0, 999, 1000, dtype=np.float32)[::-1].copy()
        sigmas = np.interp(timesteps, np.arange(1000), sigmas_train)
        np.testing.assert_allclose(np.asarray(state.timesteps, np.float64),
                                   timesteps, atol=0, rtol=0)
        np.testing.assert_allclose(state.sigmas[:-1], sigmas, rtol=1e-6)
        assert state.sigmas[-1] == 0.0
        # add_noise: sample + sigma * noise at the img2img latent timestep
        ts_sel, _ = sched.get_timesteps(state, 1000, 50 / 1000)
        t = ts_sel[0]
        assert float(t) == 49.0   # Euler maps t=50 -> timestep 49
        x = np.random.RandomState(12).randn(1, 4, 8, 8).astype(np.float32)
        eps = np.random.RandomState(13).randn(1, 4, 8, 8).astype(np.float32)
        got = np.asarray(sched.add_noise(state, jnp.asarray(x),
                                         jnp.asarray(eps), t))
        sigma = sigmas[np.nonzero(timesteps == float(t))[0][0]]
        np.testing.assert_allclose(got, x + sigma * eps, rtol=1e-5, atol=1e-6)
        scaled = np.asarray(sched.scale_model_input(state, jnp.asarray(x), t))
        np.testing.assert_allclose(scaled, x / np.sqrt(sigma ** 2 + 1),
                                   rtol=1e-5, atol=1e-6)

    def test_pndm_timesteps_and_add_noise(self):
        from diffusion_feature_tpu.schedulers.diffusion import (
            PNDMScheduler, SchedulerConfig)
        sched = PNDMScheduler(SchedulerConfig(steps_offset=1))
        state = sched.set_timesteps(1000)
        # diffusers PNDMScheduler (skip_prk_steps=True): plms timesteps get
        # the duplicated second entry, making the array 1001 long; with the
        # SD-1.5 checkpoint's steps_offset=1, index 950 of the reversed array
        # is 51 — the reference pipeline really runs t=50 extraction at
        # timestep 51 (offset+duplicate), reproduced exactly
        base = np.arange(0, 1000, dtype=np.int64) + 1
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        np.testing.assert_array_equal(state.timesteps, plms)
        ts_sel, _ = sched.get_timesteps(state, 1000, 50 / 1000)
        assert int(ts_sel[0]) == 51
        alphas_cumprod = np.cumprod(1.0 - self._betas())
        a = alphas_cumprod[51]
        x = np.random.RandomState(14).randn(1, 4, 8, 8).astype(np.float32)
        eps = np.random.RandomState(15).randn(1, 4, 8, 8).astype(np.float32)
        got = np.asarray(sched.add_noise(state, jnp.asarray(x),
                                         jnp.asarray(eps), int(ts_sel[0])))
        want = np.sqrt(a) * x + np.sqrt(1 - a) * eps
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestFullExtractStep:
    def test_composed_extract_step(self):
        """The reference's one-step extract (SURVEY §3.2): VAE encode ->
        scale -> add_noise -> scale_model_input -> U-Net forward, composed
        from the golden-verified pieces with a shared fixed noise draw."""
        from diffusion_feature_tpu.models.vae import (
            AutoencoderKL, tiny_vae_config)
        from diffusion_feature_tpu.models.unet2d import (
            UNet2DConditionModel, tiny_unet_config)
        from diffusion_feature_tpu.schedulers.diffusion import (
            PNDMScheduler, SchedulerConfig)

        vcfg = tiny_vae_config()
        ucfg = tiny_unet_config(cross_dim=32)
        ref_vae = tr.AutoencoderKLEncoder(dict(
            in_channels=3, latent_channels=4,
            block_out_channels=vcfg.block_out_channels, layers_per_block=1))
        ref_unet = tr.UNet2DConditionModel(dict(TINY_CFG))
        vae = AutoencoderKL(cfg=vcfg)
        unet = UNet2DConditionModel(cfg=ucfg,
                                    taps=TapSpec(ids=frozenset(
                                        {'up-level1-repeat0-res-out'})))

        rng = np.random.RandomState(16)
        img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
        ctx = rng.randn(1, 7, 32).astype(np.float32)
        noise = rng.randn(1, 4, 16, 16).astype(np.float32)

        vfull = vae.init(jax.random.PRNGKey(0), jnp.asarray(img),
                         method=AutoencoderKL.full_pass)['params']
        vsub = convert(ref_vae, {'encoder': vfull['encoder'],
                                 'quant_conv': vfull['quant_conv']})
        vparams = dict(vfull)
        vparams.update(vsub)
        utmpl = unet.init(jax.random.PRNGKey(1), jnp.asarray(noise), 50.0,
                          jnp.asarray(ctx))['params']
        uparams = convert(ref_unet, utmpl)

        sched = PNDMScheduler(SchedulerConfig(steps_offset=1))
        state = sched.set_timesteps(1000)
        ts, _ = sched.get_timesteps(state, 1000, 50 / 1000)
        t = int(ts[0])

        # ours (mean posterior -> deterministic)
        moments = vae.apply({'params': vparams}, jnp.asarray(img),
                            method=AutoencoderKL.encode_moments)
        mean = jnp.split(moments, 2, axis=1)[0] * vcfg.scaling_factor
        latents = sched.add_noise(state, mean, jnp.asarray(noise), t)
        lat_in = sched.scale_model_input(state, latents, t)
        out, tap_state = unet.apply({'params': uparams}, lat_in, float(t),
                                    jnp.asarray(ctx),
                                    mutable=['taps', 'attn_store'])

        # torch oracle, same noise
        with torch.no_grad():
            r_moments = ref_vae(torch.tensor(img))
            r_mean = r_moments.chunk(2, dim=1)[0] * vcfg.scaling_factor
            a = np.cumprod(1.0 - np.linspace(0.00085 ** 0.5, 0.012 ** 0.5,
                                             1000) ** 2)[t]
            r_lat = (np.sqrt(a) * r_mean
                     + np.sqrt(1 - a) * torch.tensor(noise)).float()
            ref_taps = {}
            r_out = ref_unet(r_lat, float(t), torch.tensor(ctx), taps=ref_taps)

        assert_close(out, r_out, label='extract-step unet out', atol=5e-4)
        flat = flatten_taps(tap_state['taps'])
        assert_close(flat['up-level1-repeat0-res-out'],
                     ref_taps['up-level1-repeat0-res-out'],
                     label='extract-step tap', atol=5e-4)


class TestIFGolden:
    def test_full_if_unet_every_tap(self):
        """DeepFloyd IF stage-I U-Net: scale-shift resnets, added-KV
        attention, attention-pooled text embedding, resnet down/upsamplers
        (whose taps carry the downsampler/upsampler prefix — the IF quirk
        documented in models/unet_if.py).  Oracle is the test-local
        transcription of the IF-I-L UNet2DCondition configuration
        (reference zoo entry feature/components/models.py:119-133)."""
        from diffusion_feature_tpu.models.unet_if import IFUNet, tiny_if_config
        cfg = tiny_if_config()
        tcfg = dict(
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            block_out_channels=cfg.block_out_channels,
            down_block_types=cfg.down_block_types,
            up_block_types=cfg.up_block_types,
            layers_per_block=cfg.layers_per_block,
            attention_head_dim=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            encoder_hid_dim=cfg.encoder_hid_dim,
            addition_embed_type_num_heads=cfg.addition_embed_type_num_heads)
        ref = tr.IFUNet(tcfg)
        ours = IFUNet(cfg=cfg, taps=ALL)

        rng = np.random.RandomState(14)
        sample = rng.randn(2, 3, 32, 32).astype(np.float32)
        text = rng.randn(2, 6, cfg.encoder_hid_dim).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
                             jnp.asarray(text))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                    50.0, jnp.asarray(text), mutable=['taps'])
        ref_taps = {}
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(text),
                      taps=ref_taps)
        assert_close(out, ref_out, label='if unet-out', atol=5e-5)
        flat = flatten_taps(tap_state['taps'])
        for expected in ('down-level0-repeat0-res-increment',
                         'down-level0-downsampler-out',
                         'mid-repeat0-res-out',
                         'up-level0-upsampler-increment',
                         'unet-in', 'unet-after-conv-in', 'unet-out'):
            assert expected in flat, f'missing tap {expected}'
        # IF quirk: no attention taps ever fire (AttnAddedKVProcessor has no
        # gather calls in the overlay)
        assert not any('vit' in k or '-q' in k for k in flat)
        # Round-5 root-cause: the old 1e-3 tolerance was hiding a real
        # LayerNorm-eps mismatch in IFTextTimeEmbedding (flax default 1e-6
        # vs torch 1e-5) that leaked through temb into every scale-shift
        # resnet. With epsilon pinned, IF sits at the same tier as the
        # other U-Net families.
        compare_taps(flat, ref_taps, atol=5e-5)


def build_pixart_pair(taps=None):
    """Matched (torch_ref, flax) tiny-PixArt pair — shared with
    test_grad_parity's backward goldens."""
    from diffusion_feature_tpu.models.dit_pixart import (
        PixArtTransformer2D, tiny_pixart_config)
    cfg = tiny_pixart_config()
    tcfg = dict(sample_size=cfg.sample_size, patch_size=cfg.patch_size,
                in_channels=cfg.in_channels, out_channels=cfg.out_channels,
                num_layers=cfg.num_layers,
                num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=cfg.attention_head_dim,
                caption_channels=cfg.caption_channels,
                interpolation_scale=cfg.interpolation_scale)
    torch.manual_seed(1)
    ref = tr.PixArtTransformer2DModel(tcfg)
    ours = PixArtTransformer2D(cfg=cfg, taps=ALL if taps is None else taps)
    return ref, ours, cfg


class TestPixArtGolden:
    """PixArt DiT golden parity: ada_norm_single block math (per-block
    scale_shift_table, gated residuals, NO pre-cross-attn norm), AdaLN-single
    shared modulation, caption projection, sincos positions, modulated final
    norm, unpatchify — every tap value compared (reference
    attention.py:497-594 + the PixArt pipeline transformer forward)."""

    def _build(self):
        return build_pixart_pair()

    def test_full_pixart_every_tap(self):
        ref, ours, cfg = self._build()
        rng = np.random.RandomState(20)
        lat = cfg.sample_size
        sample = rng.randn(2, cfg.in_channels, lat, lat).astype(np.float32)
        ctx = rng.randn(2, 7, cfg.caption_channels).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample),
                             500.0, jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(sample),
                                    500.0, jnp.asarray(ctx),
                                    mutable=['taps', 'attn_store'])
        ref_taps = {}
        with torch.no_grad():
            ref_out = ref(torch.tensor(sample), 500.0, torch.tensor(ctx),
                          taps=ref_taps)
        assert_close(out, ref_out, label='pixart out', atol=3e-4)
        flat = flatten_taps(tap_state['taps'])
        for expected in ('vit-block0-self-q', 'vit-block0-cross-q',
                         'vit-block0-ffn-inner', 'vit-block0-out',
                         'vit-block1-out', 'vit-block0-self-map'):
            assert expected in flat, expected
        compare_taps(flat, ref_taps, atol=3e-4)

    def test_pixart_encoder_mask(self):
        """The T5 keep-mask turns into the -10000 additive bias exactly like
        the reference pipeline feeds it."""
        ref, ours, cfg = self._build()
        rng = np.random.RandomState(21)
        lat = cfg.sample_size
        sample = rng.randn(1, cfg.in_channels, lat, lat).astype(np.float32)
        ctx = rng.randn(1, 7, cfg.caption_channels).astype(np.float32)
        keep = np.array([[1, 1, 1, 1, 0, 0, 0]], np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(sample),
                             500.0, jnp.asarray(ctx))['params']
        params = convert(ref, template)
        out, _ = ours.apply({'params': params}, jnp.asarray(sample), 500.0,
                            jnp.asarray(ctx), jnp.asarray(keep),
                            mutable=['taps', 'attn_store'])
        bias = (1.0 - torch.tensor(keep))[:, None, None, :] * -10000.0
        with torch.no_grad():
            ref_out = ref(torch.tensor(sample), 500.0, torch.tensor(ctx),
                          mask=bias)
        assert_close(out, ref_out, label='pixart masked out', atol=3e-4)


def build_flux_pair(taps=None):
    """Matched (torch_ref, flax) tiny-flux pair with converted-compatible
    configs — shared by the forward goldens here and the backward goldens
    in test_grad_parity."""
    from diffusion_feature_tpu.models.flux import (
        FluxTransformer2D, tiny_flux_config)
    cfg = tiny_flux_config()
    tcfg = dict(in_channels=cfg.in_channels, num_layers=cfg.num_layers,
                num_single_layers=cfg.num_single_layers,
                attention_head_dim=cfg.attention_head_dim,
                num_attention_heads=cfg.num_attention_heads,
                joint_attention_dim=cfg.joint_attention_dim,
                pooled_projection_dim=cfg.pooled_projection_dim)
    text_len = 8
    torch.manual_seed(2)
    ref = tr.FluxTransformer2DModel(tcfg, text_len=text_len)
    ours = FluxTransformer2D(cfg=cfg, grid_hw=(4, 4), text_len=text_len,
                             taps=ALL if taps is None else taps)
    return ref, ours, cfg, text_len


class TestFluxGolden:
    """Flux MMDiT golden parity: AdaLayerNormZero dual-stream blocks with RMS
    qk-norms + joint RoPE attention, single-stream parallel blocks, combined
    timestep/guidance/pooled conditioning, AdaLayerNormContinuous output —
    including the reference's tap quirks ('out' gathers norm_hidden_states
    in dual blocks, transformer_flux.py:210-211; text-sliced taps in single
    blocks, :107-108)."""

    def _build(self):
        return build_flux_pair()

    def test_full_flux_every_tap(self):
        import torch_ref as tr_mod
        from diffusion_feature_tpu.models.flux import (
            make_img_ids, rope_cos_sin)
        ref, ours, cfg, text_len = self._build()
        rng = np.random.RandomState(30)
        packed = rng.randn(2, 16, cfg.in_channels).astype(np.float32)
        ctx = rng.randn(2, text_len, cfg.joint_attention_dim).astype(np.float32)
        pooled = rng.randn(2, cfg.pooled_projection_dim).astype(np.float32)

        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(packed),
                             500.0, jnp.asarray(ctx),
                             jnp.asarray(pooled))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, jnp.asarray(packed),
                                    500.0, jnp.asarray(ctx),
                                    jnp.asarray(pooled),
                                    mutable=['taps', 'attn_store'])
        ids = np.concatenate([np.zeros((text_len, 3), np.float32),
                              make_img_ids(8, 8)], axis=0)
        cos, sin = tr_mod.flux_rope_cos_sin(ids, cfg.axes_dims_rope)
        ref_taps = {}
        with torch.no_grad():
            ref_out = ref(torch.tensor(packed), 500.0, torch.tensor(ctx),
                          torch.tensor(pooled), cos, sin, taps=ref_taps)
        assert_close(out, ref_out, label='flux out', atol=5e-4)
        flat = flatten_taps(tap_state['taps'])
        n_dual = cfg.num_layers
        for expected in ('vit-block0-q', 'vit-block0-cross-map',
                         'vit-block0-self-map', 'vit-block0-attn-out',
                         'vit-block0-norm-out', 'vit-block0-out',
                         'vit-block0-ffn-inner',
                         f'vit-block{n_dual}-q', f'vit-block{n_dual}-out'):
            assert expected in flat, expected
        compare_taps(flat, ref_taps, atol=5e-4)

    def test_dual_out_quirk_is_norm_hidden_states(self):
        """The 'out' tap of a dual block equals its 'norm-out' tap — the
        reference gathers norm_hidden_states twice (transformer_flux.py
        :200-201 and :210-211), NOT the residual-added output."""
        ref, ours, cfg, text_len = self._build()
        rng = np.random.RandomState(31)
        packed = rng.randn(1, 16, cfg.in_channels).astype(np.float32)
        ctx = rng.randn(1, text_len, cfg.joint_attention_dim).astype(np.float32)
        pooled = rng.randn(1, cfg.pooled_projection_dim).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), jnp.asarray(packed),
                             500.0, jnp.asarray(ctx),
                             jnp.asarray(pooled))['params']
        params = convert(ref, template)
        _, tap_state = ours.apply({'params': params}, jnp.asarray(packed),
                                  500.0, jnp.asarray(ctx), jnp.asarray(pooled),
                                  mutable=['taps', 'attn_store'])
        flat = flatten_taps(tap_state['taps'])
        np.testing.assert_array_equal(np.asarray(flat['vit-block0-out']),
                                      np.asarray(flat['vit-block0-norm-out']))


class TestHunyuanFullGolden:
    def test_full_hunyuan_every_tap(self):
        """Full HunyuanDiT2D forward vs the torch transcription: patch
        embed, pooled-T5/meta-size/style conditioning, BERT+projected-T5
        context with the learned padding row on masked positions, U-ViT
        long skips, AdaLN-shift blocks, unpatchify — plus every attention
        and ffn tap (the block-level 'out' tap intentionally never fires,
        models/hunyuan.py docstring)."""
        from diffusion_feature_tpu.models.hunyuan import (
            HunyuanDiT2D, tiny_hunyuan_config, hunyuan_rope)
        cfg = tiny_hunyuan_config()
        tcfg = dict(
            patch_size=cfg.patch_size, in_channels=cfg.in_channels,
            out_channels=cfg.out_channels, hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_attention_heads=cfg.num_attention_heads,
            cross_attention_dim=cfg.cross_attention_dim,
            cross_attention_dim_t5=cfg.cross_attention_dim_t5,
            pooled_projection_dim=cfg.pooled_projection_dim,
            text_len=cfg.text_len, text_len_t5=cfg.text_len_t5,
            mlp_ratio=cfg.mlp_ratio, norm_eps=cfg.norm_eps)
        ref = tr.HunyuanDiT2DModel(tcfg)
        ours = HunyuanDiT2D(cfg=cfg, taps=ALL)

        rng = np.random.RandomState(15)
        sample = rng.randn(2, 4, 16, 16).astype(np.float32)
        bert = rng.randn(2, cfg.text_len, cfg.cross_attention_dim
                         ).astype(np.float32)
        t5 = rng.randn(2, cfg.text_len_t5, cfg.cross_attention_dim_t5
                       ).astype(np.float32)
        bert_mask = np.ones((2, cfg.text_len), np.int32)
        bert_mask[:, -3:] = 0          # exercise the padding-row replacement
        t5_mask = np.ones((2, cfg.text_len_t5), np.int32)
        t5_mask[1, -2:] = 0

        template = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(sample), 50.0,
            jnp.asarray(bert), jnp.asarray(bert_mask), jnp.asarray(t5),
            jnp.asarray(t5_mask))['params']
        params = convert(ref, template)
        out, tap_state = ours.apply(
            {'params': params}, jnp.asarray(sample), 50.0, jnp.asarray(bert),
            jnp.asarray(bert_mask), jnp.asarray(t5), jnp.asarray(t5_mask),
            mutable=['taps', 'attn_store'])

        gh = sample.shape[2] // cfg.patch_size
        cos_np, sin_np = hunyuan_rope(gh, cfg.head_dim, cfg.rope_base_size)
        ref_taps = {}
        ref_out = ref(torch.tensor(sample), 50.0, torch.tensor(bert),
                      torch.tensor(t5), torch.tensor(cos_np),
                      torch.tensor(sin_np),
                      bert_mask=torch.tensor(bert_mask, dtype=torch.float32),
                      t5_mask=torch.tensor(t5_mask, dtype=torch.float32),
                      taps=ref_taps)
        assert_close(out, ref_out, label='hunyuan out', atol=1e-3)
        flat = flatten_taps(tap_state['taps'])
        for expected in ('vit-block0-self-q', 'vit-block0-cross-map',
                         'vit-block0-ffn-inner', 'vit-block3-self-map'):
            assert expected in flat, f'missing tap {expected}'
        # reference quirk: HunyuanDiTBlock has no block-level 'out' tap
        assert 'vit-block0-out' not in flat
        compare_taps(flat, ref_taps, atol=1e-3)


def build_hunyuan_attention_pair(is_cross, taps=None):
    """Matched (torch_ref, flax) Hunyuan attention pair — shared with
    test_grad_parity's backward goldens."""
    from diffusion_feature_tpu.models.hunyuan import (
        HunyuanAttention, tiny_hunyuan_config)
    cfg = tiny_hunyuan_config()
    torch.manual_seed(3)
    ref = tr.HunyuanAttention(cfg.hidden_size, cfg.num_attention_heads,
                              cfg.head_dim, is_cross=is_cross)
    ours = HunyuanAttention(cfg=cfg, is_cross=is_cross,
                            taps=ALL if taps is None else taps,
                            tap_name='cross' if is_cross else 'self')
    return ref, ours, cfg


class TestHunyuanAttentionGolden:
    """The Hunyuan surface the reference instruments is its attention
    processor (components/attention.py:294-401): per-head LayerNorm qk-norm,
    RoPE on q always / k only when self-attention, explicit softmax taps."""

    def _build(self, is_cross):
        return build_hunyuan_attention_pair(is_cross)

    @pytest.mark.parametrize('is_cross', [False, True])
    def test_attention_with_rope(self, is_cross):
        import torch_ref as tr_mod
        from diffusion_feature_tpu.models.hunyuan import HunyuanAttention
        ref, ours, cfg = self._build(is_cross)
        rng = np.random.RandomState(40)
        s = 16
        x = rng.randn(2, s, cfg.hidden_size).astype(np.float32)
        ctx = (rng.randn(2, 7, cfg.hidden_size).astype(np.float32)
               if is_cross else None)
        # 2-axis RoPE table over a 4x4 grid at the attention head dim
        ids = np.stack(np.meshgrid(np.arange(4), np.arange(4),
                                   indexing='ij'), -1).reshape(-1, 2)
        half = cfg.head_dim // 2
        cos_t, sin_t = tr_mod.flux_rope_cos_sin(ids, (half, half))
        cos = jnp.asarray(cos_t.numpy())
        sin = jnp.asarray(sin_t.numpy())

        args = (jnp.asarray(x),) + ((jnp.asarray(ctx),) if is_cross else (None,))
        template = ours.init(jax.random.PRNGKey(0), *args, cos, sin)['params']
        params = convert(ref, template)
        out, tap_state = ours.apply({'params': params}, *args, cos, sin,
                                    mutable=['taps', 'attn_store'])
        ref_taps = {}
        prefix = 'cross-' if is_cross else 'self-'
        with torch.no_grad():
            ref_out = ref(torch.tensor(x),
                          torch.tensor(ctx) if is_cross else None,
                          cos_t, sin_t, taps=ref_taps, prefix=prefix)
        assert_close(out, ref_out, label='hunyuan attn out', atol=1e-4)
        flat = flatten_taps(tap_state['taps'])
        assert f'{prefix}map' in flat
        compare_taps(flat, ref_taps, atol=1e-4)
