"""Tests for the facade extras: DDIM inversion, ControlNet, LoRA merging.

Reference behaviors under test:
  - use_ddim_inversion=True swaps random-noise injection for a forward-DDIM
    walk to t (feature/components/ddim_inversion.py; facade :381-386)
  - use_control=True runs controlnets and injects summed residuals
    (feature/components/controlnet.py:87-136, facade :409-441)
  - offline_lora merges low-rank deltas into the U-Net weights
    (facade :50-53)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


LAYER = {'up-level1-repeat0-res-out': True}


class TestDDIMInversion:
    def test_inversion_runs_and_differs_from_noise(self):
        fe = FeatureExtractor(layer=LAYER, version='test-sd', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a cat')
        img = [make_image(0)]
        f_inv = fe.extract(prompts, 1, img, t=50, use_ddim_inversion=True)
        f_rand = fe.extract(prompts, 1, img, t=50)
        a = np.asarray(f_inv['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f_rand['up-level1-repeat0-res-out'], np.float32)
        assert a.shape == b.shape
        assert np.isfinite(a).all()
        assert not np.allclose(a, b)

    def test_inversion_is_deterministic_given_image(self):
        # DDIM inversion replaces the stochastic noise draw; only the VAE
        # posterior sample varies, and the inverted latents dominate
        fe = FeatureExtractor(layer=LAYER, version='test-sd', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a cat')
        from diffusion_feature_tpu.ddim_inversion import ddim_invert
        img = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
        r = jax.random.PRNGKey(3)
        l1 = ddim_invert(fe, fe.params, img, jnp.zeros((1, 8, 32)),
                         stop_at_t=50, rng=r)
        l2 = ddim_invert(fe, fe.params, img, jnp.zeros((1, 8, 32)),
                         stop_at_t=50, rng=r)
        assert np.allclose(np.asarray(l1), np.asarray(l2))


class TestControlNet:
    @pytest.fixture(scope='class')
    def fe_control(self):
        return FeatureExtractor(layer=LAYER, version='test-sd', img_size=64,
                                dtype='float32', control=['canny'])

    def test_control_changes_features(self, fe_control):
        prompts = fe_control.encode_prompt('a cat')
        img = [make_image(0)]
        fe_control._rng = jax.random.PRNGKey(5)   # pin the noise draw
        f_ctrl = fe_control.extract(prompts, 1, img, t=50, use_control=True)
        fe_control._rng = jax.random.PRNGKey(5)
        f_none = fe_control.extract(prompts, 1, img, t=50, use_control=False)
        a = np.asarray(f_ctrl['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f_none['up-level1-repeat0-res-out'], np.float32)
        assert a.shape == b.shape and np.isfinite(a).all()
        # zero-convs initialize to zero -> residuals are exactly zero at
        # random init, features must MATCH up to bf16 store + XLA fusion
        # reassociation noise (trained checkpoints would diverge here)
        assert np.allclose(a, b, rtol=0.05, atol=0.05)

    def test_nonzero_residuals_propagate(self, fe_control):
        # perturb one zero-conv kernel; now control must change features
        prompts = fe_control.encode_prompt('a cat')
        img = [make_image(0)]
        p = fe_control.params['controlnet'][0]
        k = p['controlnet_mid_block']['kernel']
        p['controlnet_mid_block']['kernel'] = jnp.ones_like(k) * 0.5
        fe_control._rng = jax.random.PRNGKey(5)
        f_ctrl = fe_control.extract(prompts, 1, img, t=50, use_control=True)
        fe_control._rng = jax.random.PRNGKey(5)
        f_none = fe_control.extract(prompts, 1, img, t=50, use_control=False)
        a = np.asarray(f_ctrl['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f_none['up-level1-repeat0-res-out'], np.float32)
        assert not np.allclose(a, b)
        p['controlnet_mid_block']['kernel'] = k

    def test_canny_preprocessor(self):
        from diffusion_feature_tpu.models.controlnet import canny_edges
        img = np.zeros((64, 64, 3), np.uint8)
        img[16:48, 16:48] = 255
        edges = canny_edges(img)
        assert edges.shape == (64, 64)
        assert edges[32, 32] == 0            # interior is not an edge
        # the square boundary produces edge responses
        assert edges[14:18, 16:48].any() or edges[16:48, 14:18].any()


class TestLoRA:
    def test_merge_changes_only_targeted_weights(self, tmp_path):
        fe = FeatureExtractor(layer=LAYER, version='test-sd', img_size=64,
                              dtype='float32')
        w = np.asarray(
            fe.params['unet']['mid_block']['attentions_0']
            ['transformer_blocks_0']['attn1']['to_q']['kernel'])
        inner = w.shape[1]
        rank = 4
        rng = np.random.RandomState(0)
        down = rng.randn(rank, w.shape[0]).astype(np.float32)   # (r, I)
        up = rng.randn(inner, rank).astype(np.float32)          # (O, r)
        state = {
            'unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight': down,
            'unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight': up,
        }
        from safetensors.numpy import save_file
        f = tmp_path / 'lora.safetensors'
        save_file(state, str(f))

        from diffusion_feature_tpu.models.lora import apply_lora_to_params
        new = apply_lora_to_params(fe.params['unet'], str(f))
        w2 = np.asarray(
            new['mid_block']['attentions_0']['transformer_blocks_0']
            ['attn1']['to_q']['kernel'])
        expect = w + (up @ down).T            # scale = alpha/rank defaults to 1
        assert np.allclose(w2, expect, atol=1e-5)
        # untouched param unchanged
        other = np.asarray(new['conv_in']['kernel'])
        assert np.allclose(other, np.asarray(fe.params['unet']['conv_in']['kernel']))

    def test_unmatched_lora_raises(self, tmp_path):
        from safetensors.numpy import save_file
        from diffusion_feature_tpu.models.lora import apply_lora_to_params
        f = tmp_path / 'bad.safetensors'
        save_file({'unet.nonexistent.lora_A.weight': np.zeros((2, 3), np.float32),
                   'unet.nonexistent.lora_B.weight': np.zeros((3, 2), np.float32)},
                  str(f))
        fe = FeatureExtractor(layer=LAYER, version='test-sd', img_size=64,
                              dtype='float32')
        with pytest.raises(ValueError):
            apply_lora_to_params(fe.params['unet'], str(f))


class TestTrainUnet:
    def test_gradients_flow_into_unet_params(self):
        """train_unet=True keeps features differentiable w.r.t. U-Net weights
        (reference exposes pipe.unet as a trainable submodule,
        diffusion_feature.py:87-89; here the param tree is a jit argument so
        grads flow through the extraction program)."""
        import jax
        import jax.numpy as jnp
        fe = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                              version='test-sd', img_size=64, dtype='float32',
                              train_unet=True)
        prompts = fe.encode_prompt('a cat')
        pe, ne, pooled, _ = prompts
        pe_b = jnp.broadcast_to(jnp.asarray(pe, jnp.float32),
                                (1,) + tuple(np.shape(pe)[1:]))
        img = jnp.asarray(np.random.RandomState(0).rand(1, 3, 64, 64)
                          .astype(np.float32) * 2 - 1)
        fn = fe._get_step_fn(50, None, False, False)
        rng = jax.random.PRNGKey(0)

        def loss(params):
            feats = fn(params, img, pe_b, None, None, rng)
            return jnp.mean(feats['up-level1-repeat0-res-out'] ** 2)

        g = jax.grad(loss)(fe.params)
        gnorm = float(jnp.linalg.norm(
            g['unet']['conv_in']['kernel'].astype(jnp.float32)))
        assert np.isfinite(gnorm) and gnorm > 0
        # features stayed full precision (no bf16 cast in train mode)
        feats = fn(fe.params, img, pe_b, None, None, rng)
        assert feats['up-level1-repeat0-res-out'].dtype == jnp.float32


class TestDDIMGuard:
    def test_xl_rejects_ddim_inversion(self):
        fe = FeatureExtractor(layer=LAYER, version='test-xl', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a cat')
        with pytest.raises(NotImplementedError):
            fe.extract(prompts, 1, [make_image()], t=50,
                       use_ddim_inversion=True)


class TestLoRADialects:
    def test_collect_pairs_kohya_and_legacy(self):
        from diffusion_feature_tpu.models.lora import collect_lora_pairs
        rng = np.random.RandomState(0)
        d = rng.randn(4, 8).astype(np.float32)
        u = rng.randn(8, 4).astype(np.float32)
        state = {
            # kohya with alpha
            'lora_unet_mid_block_attentions_0_to_q.lora_down.weight': d,
            'lora_unet_mid_block_attentions_0_to_q.lora_up.weight': u,
            'lora_unet_mid_block_attentions_0_to_q.alpha': np.float32(2.0),
            # legacy diffusers attn-procs
            'mid_block.attentions.0.to_k.lora.down.weight': d,
            'mid_block.attentions.0.to_k.lora.up.weight': u,
        }
        pairs = collect_lora_pairs(state)
        assert len(pairs) == 2
        kohya = pairs['mid_block_attentions_0_to_q']
        assert kohya[2] == pytest.approx(2.0 / 4)        # alpha / rank
        legacy = pairs['mid_block.attentions.0.to_k']
        assert legacy[2] == pytest.approx(1.0)           # default scale


class TestScanSampler:
    """The lax.scan generation loop (facade._get_sample_fn use_scan path)
    must reproduce the statically-unrolled loop exactly: same rng stream,
    same images, same per-step tap encounters (VERDICT r2 weak-item 1)."""

    def _run_both(self, version, layer, steps=4, guidance=5.0):
        fe = FeatureExtractor(layer=layer, version=version, img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a scan test')
        fe._rng = jax.random.PRNGKey(3)
        im_scan, f_scan = fe.sample(prompts, batch_size=1,
                                    num_inference_steps=steps,
                                    guidance_scale=guidance)
        fe._rng = jax.random.PRNGKey(3)
        im_unroll, f_unroll = fe.sample(prompts, batch_size=1,
                                        num_inference_steps=steps,
                                        guidance_scale=guidance,
                                        unrolled=True)
        return im_scan, f_scan, im_unroll, f_unroll

    def _assert_match(self, im_scan, f_scan, im_unroll, f_unroll):
        np.testing.assert_allclose(np.asarray(im_scan, np.float32),
                                   np.asarray(im_unroll, np.float32),
                                   rtol=1e-5, atol=1e-5)
        assert set(f_scan) == set(f_unroll)
        for k in f_unroll:
            assert len(f_scan[k]) == len(f_unroll[k]), k
            for a, b in zip(f_scan[k], f_unroll[k]):
                # scanned vs unrolled graphs fuse differently; per-step
                # intermediate taps carry ~3e-4 fp32 reassociation noise
                # (the final images agree at 1e-5)
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(b, np.float32),
                                           rtol=1e-3, atol=5e-4, err_msg=k)

    def test_euler_xl_scan_matches_unrolled(self):
        self._assert_match(*self._run_both(
            'test-xl', {'up-level1-repeat0-res-out': True,
                        'mid-vit-block0-self-q': True}))

    def test_ddpm_if_scan_matches_unrolled(self):
        # IF: learned_range variance + dynamic thresholding in the step
        self._assert_match(*self._run_both(
            'test-if', {'up-level1-repeat0-res-out': True}))

    def test_pndm_sd15_scan_matches_unrolled(self):
        # PLMS: 4-slot ets ring in the scan carry, counter==0/1
        # sample/timestep rewiring as per-position flags.  6 steps so the
        # full Adams-Bashforth 4-history blend is exercised.
        self._assert_match(*self._run_both('test-sd', LAYER, steps=6))

    def test_dpmsolver_pixart_scan_matches_unrolled(self):
        # PixArt text2img (reference np_inference_call parity): DPM-Solver
        # 2nd-order multistep scans with the previous x0 carried
        im_scan, f_scan, im_unroll, f_unroll = self._run_both(
            'test-pixart', {'vit-block0-out': True}, steps=5, guidance=4.5)
        assert im_scan.shape == im_unroll.shape
        assert len(f_scan['vit-block0-out']) == 5
        self._assert_match(im_scan, f_scan, im_unroll, f_unroll)

    def test_flowmatch_flux_scan_matches_unrolled(self):
        # rectified-flow Euler scans (schedulers/flow_match.py scan_plan);
        # flux is guidance-distilled so there is no CFG double-batch and
        # guidance_scale rides the guidance embedding.  The reference's
        # patched flux pipeline cannot generate at all (early return,
        # overlay pipeline_flux_img2img.py:841) — sample() here follows
        # stock FluxPipeline semantics.
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=32,
                              dtype='float32')
        fe._rng = jax.random.PRNGKey(3)
        im_s, f_s = fe.sample('a flux scan test', batch_size=1,
                              num_inference_steps=4, guidance_scale=3.5)
        fe._rng = jax.random.PRNGKey(3)
        im_u, f_u = fe.sample('a flux scan test', batch_size=1,
                              num_inference_steps=4, guidance_scale=3.5,
                              unrolled=True)
        assert len(f_s['vit-block0-out']) == 4
        assert f_s['vit-block0-out'][0].shape[0] == 1  # no CFG doubling
        self._assert_match(im_s, f_s, im_u, f_u)

    def test_ddpm_hunyuan_scan_matches_unrolled(self):
        # dual-stream (BERT+T5) CFG conditioning with masks; the model's
        # learned-sigma output halves are dropped before the DDPM step
        # (stock HunyuanDiTPipeline semantics — the reference's patched
        # pipeline early-returns, overlay pipeline_hunyuandit.py:1080)
        fe = FeatureExtractor(layer={'vit-block0-self-q': True},
                              version='test-hunyuan', img_size=32,
                              dtype='float32')
        fe._rng = jax.random.PRNGKey(4)
        im_s, f_s = fe.sample('a hunyuan scan test', batch_size=1,
                              num_inference_steps=3, guidance_scale=5.0)
        fe._rng = jax.random.PRNGKey(4)
        im_u, f_u = fe.sample('a hunyuan scan test', batch_size=1,
                              num_inference_steps=3, guidance_scale=5.0,
                              unrolled=True)
        assert f_s['vit-block0-self-q'][0].shape[0] == 2  # CFG doubled
        self._assert_match(im_s, f_s, im_u, f_u)

    def test_scan_sampler_bf16_dtypes(self):
        """Production dtype regression (code-review r3): a float32
        coefficient multiplying outside the .astype(sample.dtype) cast
        promotes the scan carry and fails lax.scan's carry-type check.
        Covers the learned-range DDPM branch (IF) and euler (XL)."""
        for version, layer in (('test-if', {'up-level1-repeat0-res-out': True}),
                               ('test-xl', {'up-level1-repeat0-res-out': True}),
                               ('test-sd', LAYER)):
            fe = FeatureExtractor(layer=layer, version=version, img_size=32,
                                  dtype='bfloat16')
            prompts = fe.encode_prompt('a probe')
            images, feats = fe.sample(prompts, batch_size=1,
                                      num_inference_steps=3,
                                      guidance_scale=5.0)
            assert np.isfinite(np.asarray(images, np.float32)).all(), version
