"""Core substrate tests: tap spec, store post-processing, dump format,
scheduler timestep semantics (parity oracles from SURVEY.md §2.2/§2.6)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_feature_tpu.taps import TapSpec, child_id, flatten_taps
from diffusion_feature_tpu.store import (
    adaptive_avg_pool2d,
    postprocess_feature,
    select_background_encounters,
)
from diffusion_feature_tpu.io.dump import save_batch, aggregate_features
from diffusion_feature_tpu.schedulers import (
    SchedulerConfig,
    PNDMScheduler,
    EulerDiscreteScheduler,
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
)


class TestTapSpec:
    def test_from_dict_config(self):
        spec = TapSpec.from_config({'up-level1-repeat1-vit-block0-cross-q': True,
                                    'up-level1-repeat2-res-out': False})
        assert spec.wants('up-level1-repeat1-vit-block0-cross-q')
        assert not spec.wants('up-level1-repeat2-res-out')
        assert not spec.accept_all

    def test_empty_config_is_accept_all(self):
        # reference: empty to_store => accept-all (feature_extractor.py:10-15)
        spec = TapSpec.from_config({})
        assert spec.accept_all
        assert spec.wants('anything')

    def test_cross_kv_always_filtered(self):
        spec = TapSpec.all()
        assert not spec.wants('mid-vit-block0-cross-k')
        assert not spec.wants('mid-vit-block0-cross-v')
        assert spec.wants('mid-vit-block0-cross-q')

    def test_json_file_config(self, tmp_path):
        p = tmp_path / 'cfg.json'
        p.write_text(json.dumps({'a-b-out': True}))
        spec = TapSpec.from_config(str(p))
        assert spec.wants('a-b-out')

    def test_wants_any_map(self):
        assert TapSpec.from_config({'mid-vit-block0-self-map': True}).wants_any_map
        assert not TapSpec.from_config({'mid-vit-block0-self-q': True}).wants_any_map

    def test_child_id(self):
        assert child_id('down-level0-repeat1', 'res') == 'down-level0-repeat1-res'
        assert child_id('', 'unet') == 'unet'


class TestStore:
    def test_tokens_reshaped_to_square_map(self):
        # (B, S, C) -> (B, C, sqrt(S), sqrt(S))  (feature_extractor.py:46-48)
        feat = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
        out = postprocess_feature(feat, out_dtype=None)
        assert out.shape == (2, 3, 4, 4)
        # channel c at (h,w) == token h*4+w channel c
        np.testing.assert_allclose(np.asarray(out)[0, 1, 2, 3], np.asarray(feat)[0, 11, 1])

    def test_4d_map_untouched_by_reshape(self):
        feat = jnp.ones((2, 8, 16, 16))
        out = postprocess_feature(feat, out_dtype=None)
        assert out.shape == (2, 8, 16, 16)

    def test_resize_ratio_pools(self):
        feat = jnp.ones((1, 4, 8, 8))
        out = postprocess_feature(feat, resize_ratio=2, out_dtype=None)
        assert out.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_adaptive_pool_matches_torch(self):
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(0).rand(2, 3, 7, 9).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (3, 4)))
        theirs = F.adaptive_avg_pool2d(torch.from_numpy(x), (3, 4)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_dtype_cast(self):
        feat = jnp.ones((1, 2, 4, 4), dtype=jnp.float32)
        assert postprocess_feature(feat).dtype == jnp.bfloat16

    def test_background_encounter_selection(self):
        # reference feature_extractor.py:68-76 — 1-based encounter filtering
        taps = {'unet-out': tuple(jnp.full((1, 1, 2, 2), i) for i in range(5))}
        out = select_background_encounters(taps, [1, 3])
        assert out['unet-out']['count'] == 5
        assert set(out['unet-out']['feat'].keys()) == {1, 3}
        np.testing.assert_allclose(np.asarray(out['unet-out']['feat'][3])[0, 0, 0, 0], 2)

    def test_flatten_taps(self):
        tree = {'down': {'res0': {'down-level0-repeat0-res-out': (jnp.ones(2),)}},
                'unet-out': (jnp.zeros(2),)}
        flat = flatten_taps(tree)
        assert set(flat) == {'down-level0-repeat0-res-out', 'unet-out'}
        assert flat['unet-out'].shape == (2,)


class TestDump:
    def _feats(self):
        return {
            'layer-a': np.ones((2, 3, 8, 8), np.float32),
            'layer-b': np.full((2, 2, 4, 4), 2.0, np.float32),
        }

    def test_layer_first_layout(self, tmp_path):
        save_batch(self._feats(), str(tmp_path), batch_start_index=0, split='train')
        assert os.path.exists(tmp_path / 'layer-a' / 'train0.npy')
        assert os.path.exists(tmp_path / 'layer-b' / 'train1.npy')
        arr = np.load(tmp_path / 'layer-a' / 'train0.npy')
        assert arr.shape == (3, 8, 8) and arr.dtype == np.float16

    def test_sample_first_layout(self, tmp_path):
        save_batch(self._feats(), str(tmp_path), batch_start_index=3, split='val',
                   sample_name_first=True)
        assert os.path.exists(tmp_path / 'val3' / 'layer-a.npy')
        assert os.path.exists(tmp_path / 'val4' / 'layer-b.npy')

    def test_original_filenames(self, tmp_path):
        save_batch(self._feats(), str(tmp_path), batch_start_index=0,
                   original_names=['img_x', 'img_y'], use_original_filename=True)
        assert os.path.exists(tmp_path / 'layer-a' / 'img_x.npy')

    def test_aggregate_output(self, tmp_path):
        save_batch(self._feats(), str(tmp_path), batch_start_index=0,
                   aggregate_output=True)
        arr = np.load(tmp_path / 'train0.npy')
        # resized to max spatial size (8), channels concatenated 3+2
        assert arr.shape == (5, 8, 8)

    def test_aggregate_matches_torch_interpolate(self):
        import torch
        import torch.nn.functional as F
        feats = {'a': np.random.RandomState(1).rand(1, 2, 4, 4).astype(np.float32),
                 'b': np.random.RandomState(2).rand(1, 1, 8, 8).astype(np.float32)}
        ours = aggregate_features(feats)
        ref = torch.cat([
            F.interpolate(torch.from_numpy(feats['a']), 8, mode='nearest'),
            torch.from_numpy(feats['b']),
        ], dim=1).numpy()
        # reference uses default mode='nearest' in aggregate (extract_feature.py:118)
        # ours uses bilinear — assert shapes match and values are close for the
        # identity-resize layer
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours[:, 2:], ref[:, 2:], atol=1e-6)


class TestSchedulerTimesteps:
    """The off-by-one parity matrix from SURVEY §7 hard part (e)."""

    def _latent_timestep(self, sched, t):
        state = sched.set_timesteps(1000)
        timesteps, _ = sched.get_timesteps(state, 1000, t / 1000)
        return float(timesteps[0])

    def test_pndm_latent_timestep(self):
        # PNDM/PLMS duplicated entry => t=50 -> 50
        sched = PNDMScheduler(SchedulerConfig(steps_offset=1))
        state = sched.set_timesteps(1000)
        assert len(state.timesteps) == 1001
        sched0 = PNDMScheduler(SchedulerConfig())
        assert self._latent_timestep(sched0, 50) == 50

    def test_euler_latent_timestep(self):
        sched = EulerDiscreteScheduler(SchedulerConfig())
        assert self._latent_timestep(sched, 50) == 49.0

    def test_ddim_latent_timestep(self):
        sched = DDIMScheduler(SchedulerConfig())
        assert self._latent_timestep(sched, 50) == 49

    def test_dpmsolver_latent_timestep(self):
        sched = DPMSolverMultistepScheduler(SchedulerConfig())
        assert self._latent_timestep(sched, 50) == 50

    def test_add_noise_ddpm_formula(self):
        sched = DDPMScheduler(SchedulerConfig())
        state = sched.set_timesteps(1000)
        x = jnp.ones((1, 4, 8, 8))
        noise = jnp.full((1, 4, 8, 8), 0.5)
        out = sched.add_noise(state, x, noise, 49)
        a = sched.alphas_cumprod[49]
        expected = np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 0.5
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], expected, rtol=1e-6)

    def test_euler_add_noise_and_scale(self):
        sched = EulerDiscreteScheduler(SchedulerConfig())
        state = sched.set_timesteps(1000)
        sigma = np.sqrt((1 - sched.alphas_cumprod[49]) / sched.alphas_cumprod[49])
        x = jnp.zeros((1, 4, 4, 4))
        noise = jnp.ones((1, 4, 4, 4))
        noisy = sched.add_noise(state, x, noise, 49.0)
        np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0, 0], sigma, rtol=1e-4)
        scaled = sched.scale_model_input(state, noisy, 49.0)
        np.testing.assert_allclose(
            np.asarray(scaled)[0, 0, 0, 0], sigma / np.sqrt(sigma**2 + 1), rtol=1e-4
        )

    def test_euler_step_integrates(self):
        sched = EulerDiscreteScheduler(SchedulerConfig())
        state = sched.set_timesteps(10)
        t = state.timesteps[0]
        x = jnp.ones((1, 1, 2, 2))
        eps = jnp.zeros((1, 1, 2, 2))
        prev, _ = sched.step(state, eps, t, x)
        # with eps=0, x0 = x, derivative 0 => unchanged
        np.testing.assert_allclose(np.asarray(prev), 1.0, rtol=1e-5)

    def test_ddim_step_matches_closed_form(self):
        sched = DDIMScheduler(SchedulerConfig())
        state = sched.set_timesteps(10)
        t = int(state.timesteps[0])
        x = jnp.ones((1, 1, 2, 2))
        eps = jnp.full((1, 1, 2, 2), 0.1)
        prev, _ = sched.step(state, eps, t, x)
        a_t = sched.alphas_cumprod[t]
        a_p = sched.alphas_cumprod[t - 100]
        x0 = (1.0 - np.sqrt(1 - a_t) * 0.1) / np.sqrt(a_t)
        expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * 0.1
        np.testing.assert_allclose(np.asarray(prev)[0, 0, 0, 0], expected, rtol=1e-5)


class TestFlowMatch:
    def test_sigma_schedule_and_scale_noise(self):
        from diffusion_feature_tpu.schedulers import (
            FlowMatchEulerDiscreteScheduler, FlowMatchConfig, calculate_shift,
        )
        sched = FlowMatchEulerDiscreteScheduler(FlowMatchConfig())
        mu = calculate_shift(1024, sched.config)
        state = sched.set_timesteps(1000, mu=mu)
        ts, _ = sched.get_timesteps(state, 1000, 0.05)
        assert len(ts) == 50
        x = jnp.zeros((1, 16, 2))
        noise = jnp.ones((1, 16, 2))
        noisy = sched.scale_noise(state, x, noise, float(ts[0]))
        sigma = state.sigmas[1000 - 50]
        np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0], sigma, rtol=1e-5)

    def test_scan_plan_trailing_subset_aligns_with_step(self):
        """A scan_plan over a trailing subset of the ladder (the facade's
        denoising_from walk) must pick each row's Δσ at ITS ladder position,
        exactly as step()'s per-timestep index lookup would — not restart
        from position 0."""
        from diffusion_feature_tpu.schedulers import (
            FlowMatchEulerDiscreteScheduler, FlowMatchConfig,
        )
        sched = FlowMatchEulerDiscreteScheduler(FlowMatchConfig())
        state = sched.set_timesteps(10, mu=1.0)
        subset = state.timesteps[4:]
        plan = sched.scan_plan(state, timesteps=subset)
        assert len(plan['timestep']) == len(subset)

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 16, 4), jnp.float32)
        out = jnp.asarray(rng.randn(1, 16, 4), jnp.float32)
        x_step, x_scan = x, x
        for i, ts in enumerate(subset):
            x_step, _ = sched.step(state, out, float(ts), x_step)
            row = {k: jnp.asarray(v[i]) for k, v in plan.items()}
            x_scan, _ = sched.scan_step(row, out, x_scan)
        np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_step),
                                   rtol=1e-6, atol=1e-6)


class TestCheckpointConfigAdaptation:
    def test_spec_adapts_to_local_config_json(self, tmp_path):
        import json, os
        from diffusion_feature_tpu.facade import _adapt_spec_to_checkpoint
        from diffusion_feature_tpu.models.registry import get_model_spec
        os.makedirs(tmp_path / 'unet')
        os.makedirs(tmp_path / 'vae')
        json.dump({'block_out_channels': [64, 128],
                   'down_block_types': ['CrossAttnDownBlock2D', 'DownBlock2D'],
                   'up_block_types': ['UpBlock2D', 'CrossAttnUpBlock2D'],
                   'layers_per_block': 1, 'attention_head_dim': 4,
                   'cross_attention_dim': 512},
                  open(tmp_path / 'unet' / 'config.json', 'w'))
        json.dump({'block_out_channels': [32, 64], 'latent_channels': 8,
                   'scaling_factor': 0.5},
                  open(tmp_path / 'vae' / 'config.json', 'w'))
        spec = get_model_spec('1-5')
        adapted = _adapt_spec_to_checkpoint(spec, str(tmp_path))
        assert adapted.unet.block_out_channels == (64, 128)
        assert adapted.unet.num_attention_heads == (4, 4)
        assert adapted.unet.cross_attention_dim == 512
        assert adapted.vae.latent_channels == 8
        assert adapted.vae.scaling_factor == 0.5
        # no config files -> unchanged
        assert _adapt_spec_to_checkpoint(spec, '/nonexistent') is spec


class TestWordPiece:
    def test_greedy_longest_match(self, tmp_path):
        from diffusion_feature_tpu.tokenizers.wordpiece import WordPieceTokenizer
        vocab = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', 'un', '##aff', '##able',
                 'cat', '!', 'running', 'run', '##ning']
        vp = tmp_path / 'vocab.txt'
        vp.write_text('\n'.join(vocab) + '\n')
        tok = WordPieceTokenizer(str(vp), model_max_length=12)
        ids, mask = tok('unaffable cat!')
        v = {w: i for i, w in enumerate(vocab)}
        expect = [v['[CLS]'], v['un'], v['##aff'], v['##able'], v['cat'],
                  v['!'], v['[SEP]']]
        assert ids[0][:7] == expect
        assert mask[0][:7] == [1] * 7 and mask[0][7:] == [0] * 5
        # longest-match picks 'running' whole, not run+##ning
        ids2, _ = tok('running')
        assert ids2[0][1] == v['running']

    def test_unknown_word_is_unk(self, tmp_path):
        from diffusion_feature_tpu.tokenizers.wordpiece import WordPieceTokenizer
        vp = tmp_path / 'v.txt'
        vp.write_text('[PAD]\n[UNK]\n[CLS]\n[SEP]\n')
        tok = WordPieceTokenizer(str(vp), model_max_length=8)
        ids, _ = tok('zzz')
        assert ids[0][1] == 1   # [UNK]


class TestDiTConfigAdaptation:
    def test_flux_and_pixart_adapt(self, tmp_path):
        import json, os
        from diffusion_feature_tpu.facade import _adapt_spec_to_checkpoint
        from diffusion_feature_tpu.models.registry import get_model_spec
        os.makedirs(tmp_path / 'transformer')
        json.dump({'num_layers': 4, 'num_single_layers': 8,
                   'attention_head_dim': 64, 'num_attention_heads': 8,
                   'guidance_embeds': False},
                  open(tmp_path / 'transformer' / 'config.json', 'w'))
        spec = get_model_spec('flux')
        adapted = _adapt_spec_to_checkpoint(spec, str(tmp_path))
        assert adapted.dit.num_layers == 4
        assert adapted.dit.num_single_layers == 8
        assert adapted.dit.guidance_embeds is False

        json.dump({'num_layers': 3, 'attention_head_dim': 16,
                   'num_attention_heads': 4, 'cross_attention_dim': 64},
                  open(tmp_path / 'transformer' / 'config.json', 'w'))
        spec2 = get_model_spec('pixart-alpha')
        adapted2 = _adapt_spec_to_checkpoint(spec2, str(tmp_path))
        assert adapted2.dit.num_layers == 3
        assert adapted2.dit.inner_dim == 64


class TestWordPieceCJK:
    def test_cjk_chars_tokenize_individually(self, tmp_path):
        from diffusion_feature_tpu.tokenizers.wordpiece import WordPieceTokenizer
        vocab = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '猫', '草', 'cat']
        vp = tmp_path / 'v.txt'
        vp.write_text('\n'.join(vocab) + '\n', encoding='utf-8')
        tok = WordPieceTokenizer(str(vp), model_max_length=10)
        ids, _ = tok('猫草cat')
        v = {w: i for i, w in enumerate(vocab)}
        assert ids[0][:5] == [v['[CLS]'], v['猫'], v['草'], v['cat'], v['[SEP]']]


class TestDPMSolverStepClosedForm:
    """Pin the DPM-Solver++ (2M) update math (the denoising_from multi-step
    path for the PixArt family) against the closed forms of the paper /
    diffusers implementation."""

    def _sched(self):
        from diffusion_feature_tpu.schedulers import (
            DPMSolverMultistepScheduler, SchedulerConfig)
        return DPMSolverMultistepScheduler(SchedulerConfig())

    def test_first_step_is_first_order_ddim_like(self):
        sched = self._sched()
        state = sched.set_timesteps(20)
        t = int(state.timesteps[0])
        p = int(state.timesteps[1])
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        eps = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        prev, st2 = sched.step(state, eps, t, x)

        a = np.sqrt(sched.alphas_cumprod)
        s = np.sqrt(1 - sched.alphas_cumprod)
        lam = np.log(a) - np.log(s)
        x0 = (np.asarray(x) - s[t] * np.asarray(eps)) / a[t]
        h = lam[p] - lam[t]
        want = (s[p] / s[t]) * np.asarray(x) - a[p] * np.expm1(-h) * x0
        np.testing.assert_allclose(np.asarray(prev), want, rtol=1e-5,
                                   atol=1e-5)
        assert len(st2.ets) == 1

    def test_second_step_uses_2m_midpoint_correction(self):
        sched = self._sched()
        state = sched.set_timesteps(20)
        t0 = int(state.timesteps[0])
        t1 = int(state.timesteps[1])
        t2 = int(state.timesteps[2])
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        e0 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        e1 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        x1, st = sched.step(state, e0, t0, x)
        x2, _ = sched.step(st, e1, t1, x1)

        a = np.sqrt(sched.alphas_cumprod)
        s = np.sqrt(1 - sched.alphas_cumprod)
        lam = np.log(a) - np.log(s)
        x0_0 = (np.asarray(x) - s[t0] * np.asarray(e0)) / a[t0]
        x0_1 = (np.asarray(x1) - s[t1] * np.asarray(e1)) / a[t1]
        h = lam[t2] - lam[t1]
        h_prev = lam[t1] - lam[t0]
        r = h_prev / h
        d = (1 + 1 / (2 * r)) * x0_1 - (1 / (2 * r)) * x0_0
        want = (s[t2] / s[t1]) * np.asarray(x1) - a[t2] * np.expm1(-h) * d
        np.testing.assert_allclose(np.asarray(x2), want, rtol=1e-5,
                                   atol=1e-5)


class TestDenoisingFrom:
    """extract(denoising_from=...) — the reference's _denoise multi-step
    loop (diffusion_feature.py:592-675): denoise from a higher timestep down
    to t, then extract at t."""

    def _fe(self, version='test-sd'):
        from diffusion_feature_tpu import FeatureExtractor
        return FeatureExtractor(layer={'unet-out': True}, version=version,
                                img_size=64, dtype='float32', seed=0)

    def test_runs_and_differs_from_plain_t(self):
        from PIL import Image
        fe = self._fe()
        img = [Image.fromarray((np.random.RandomState(0).rand(64, 64, 3)
                                * 255).astype('uint8'))]
        prompts = fe.encode_prompt('a cat')
        fe._rng = jax.random.PRNGKey(3)
        plain = fe.extract(prompts, 1, img, t=50)['unet-out']
        fe._rng = jax.random.PRNGKey(3)
        # 80-50 <= 50 exercises the fine-grained 1000-step branch with a
        # compile-friendly ~30-step unroll (the >50 branch is covered by
        # the pixart test below)
        multi = fe.extract(prompts, 1, img, t=50,
                           denoising_from=80)['unet-out']
        a = np.asarray(plain, np.float32)
        b = np.asarray(multi, np.float32)
        assert np.isfinite(b).all()
        assert a.shape == b.shape
        # the multi-step path really denoises: features differ from plain t
        assert not np.allclose(a, b)

    def test_deterministic_given_rng(self):
        from PIL import Image
        fe = self._fe()
        img = [Image.fromarray((np.random.RandomState(1).rand(64, 64, 3)
                                * 255).astype('uint8'))]
        prompts = fe.encode_prompt('a cat')
        fe._rng = jax.random.PRNGKey(4)
        a = np.asarray(fe.extract(prompts, 1, img, t=50,
                                  denoising_from=80)['unet-out'], np.float32)
        fe._rng = jax.random.PRNGKey(4)
        b = np.asarray(fe.extract(prompts, 1, img, t=50,
                                  denoising_from=80)['unet-out'], np.float32)
        np.testing.assert_allclose(a, b)

    def test_pixart_dpmsolver_path(self):
        """denoising_from through the DPM-Solver 2M multistep updates."""
        from PIL import Image
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-pixart', img_size=64,
                              dtype='float32', seed=0)
        img = [Image.fromarray((np.random.RandomState(2).rand(64, 64, 3)
                                * 255).astype('uint8'))]
        prompts = fe.encode_prompt('a cat')
        feats = fe.extract(prompts, 1, img, t=50, denoising_from=300)
        arr = np.asarray(feats['vit-block0-out'], np.float32)
        assert np.isfinite(arr).all()


class TestImg2ImgKitStepParity:
    """facade._img2img_kit folds ONE fresh-state scheduler step into scalar
    coefficients for the t-generic program's vae-out decode
    (facade._get_step_fn_generic).  The folded algebra — including the DDPM
    x0 clamp mirror and prediction_type='sample' — must reproduce
    ``sched.step`` bit-for-bit-ish for every (family, prediction_type) the
    schedulers themselves support."""

    def _kit(self, sched, t):
        import types
        from diffusion_feature_tpu.facade import FeatureExtractor
        host = types.SimpleNamespace(scheduler=sched)
        return FeatureExtractor._img2img_kit(host, t)

    def _assert_matches_step(self, sched, t=250):
        kit = self._kit(sched, t)
        state = sched.set_timesteps(1000)
        timesteps, _ = sched.get_timesteps(state, 1000, t / 1000)
        lt = timesteps[0]
        rng = np.random.RandomState(0)
        # amplitude 3 so clip_sample/thresholding actually bite
        x = jnp.asarray(rng.randn(2, 4, 8, 8) * 3, jnp.float32)
        out = jnp.asarray(rng.randn(2, 4, 8, 8) * 3, jnp.float32)

        # replicate the generic step's vae-out algebra exactly
        x0 = kit['X1'] * x + kit['X2'] * out
        if isinstance(sched, DDPMScheduler):
            if sched.config.thresholding:
                x0 = sched._threshold(x0)
            elif sched.config.clip_sample:
                x0 = jnp.clip(x0, -1.0, 1.0)
        lat2 = kit['C1'] * x0 + kit['C2'] * x + kit['C3'] * out

        want, _ = sched.step(state, out, lt, x)
        np.testing.assert_allclose(np.asarray(lat2), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize('pred', ['epsilon', 'v_prediction', 'sample'])
    def test_ddpm(self, pred):
        self._assert_matches_step(
            DDPMScheduler(SchedulerConfig(prediction_type=pred)))

    def test_ddpm_clip_sample(self):
        self._assert_matches_step(
            DDPMScheduler(SchedulerConfig(clip_sample=True)))

    def test_ddpm_thresholding(self):
        # IF's checkpoint config: dynamic thresholding at 0.95 / 1.5
        self._assert_matches_step(
            DDPMScheduler(SchedulerConfig(
                thresholding=True, dynamic_thresholding_ratio=0.95,
                sample_max_value=1.5)))

    def test_ddpm_sample_with_clip(self):
        self._assert_matches_step(
            DDPMScheduler(SchedulerConfig(prediction_type='sample',
                                          clip_sample=True)))

    @pytest.mark.parametrize('pred', ['epsilon', 'v_prediction', 'sample'])
    def test_ddim(self, pred):
        self._assert_matches_step(
            DDIMScheduler(SchedulerConfig(prediction_type=pred)))

    @pytest.mark.parametrize('pred', ['epsilon', 'v_prediction', 'sample'])
    def test_euler(self, pred):
        self._assert_matches_step(
            EulerDiscreteScheduler(SchedulerConfig(prediction_type=pred)))

    @pytest.mark.parametrize('pred', ['epsilon', 'v_prediction', 'sample'])
    def test_dpmsolver(self, pred):
        self._assert_matches_step(
            DPMSolverMultistepScheduler(SchedulerConfig(prediction_type=pred)))

    @pytest.mark.parametrize('pred', ['epsilon', 'v_prediction'])
    def test_pndm(self, pred):
        self._assert_matches_step(
            PNDMScheduler(SchedulerConfig(prediction_type=pred)))

    def test_pndm_sample_raises(self):
        # PLMS has no 'sample' fold (diffusers' step_plms raises too)
        with pytest.raises(NotImplementedError):
            self._kit(PNDMScheduler(
                SchedulerConfig(prediction_type='sample')), 250)
