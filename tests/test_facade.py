"""Facade tests: end-to-end extraction flows on the tiny offline models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


@pytest.fixture(scope='module')
def fe_sd():
    return FeatureExtractor(
        layer={'mid-vit-block0-self-q': True,
               'up-level1-repeat0-res-out': True,
               'mid-vit-block0-self-map': True},
        version='test-sd', img_size=64, dtype='float32')


class TestExtract:
    def test_basic_extract(self, fe_sd):
        prompts = fe_sd.encode_prompt('a cat')
        feats = fe_sd.extract(prompts, 2, [make_image(0), make_image(1)], t=50)
        assert set(feats) == {'mid-vit-block0-self-q',
                              'up-level1-repeat0-res-out',
                              'mid-vit-block0-self-map'}
        q = feats['mid-vit-block0-self-q']
        assert q.shape[0] == 2 and q.ndim == 4      # B,C,h,w
        m = feats['mid-vit-block0-self-map']
        assert m.ndim == 4 and m.shape[2] == m.shape[3]  # B,H,Sq,Sk
        assert q.dtype == jnp.bfloat16

    def test_timestep_changes_features(self, fe_sd):
        prompts = fe_sd.encode_prompt('a cat')
        img = [make_image(0)]
        f1 = fe_sd.extract(prompts, 1, img, t=50)
        f2 = fe_sd.extract(prompts, 1, img, t=500)
        a = np.asarray(f1['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f2['up-level1-repeat0-res-out'], np.float32)
        assert not np.allclose(a, b)

    def test_prompt_conditions_features(self, fe_sd):
        img = [make_image(0)]
        p1 = fe_sd.encode_prompt('a cat')
        p2 = fe_sd.encode_prompt('a completely different dog')
        f1 = fe_sd.extract(p1, 1, img, t=50)
        f2 = fe_sd.extract(p2, 1, img, t=50)
        a = np.asarray(f1['mid-vit-block0-self-q'], np.float32)
        b = np.asarray(f2['mid-vit-block0-self-q'], np.float32)
        assert not np.allclose(a, b)

    def test_tensor_input(self, fe_sd):
        prompts = fe_sd.encode_prompt('a cat')
        x = np.random.RandomState(0).rand(2, 3, 48, 48).astype(np.float32) * 2 - 1
        feats = fe_sd.extract(prompts, 2, x, image_type='tensors', t=50)
        assert feats['up-level1-repeat0-res-out'].shape[0] == 2

    def test_feature_resize(self):
        fe = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                              version='test-sd', img_size=64, dtype='float32',
                              feature_resize=2)
        prompts = fe.encode_prompt('x')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        full = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                                version='test-sd', img_size=64, dtype='float32')
        ffull = full.extract(prompts, 1, [make_image()], t=50)
        assert (feats['up-level1-repeat0-res-out'].shape[-1] * 2
                == ffull['up-level1-repeat0-res-out'].shape[-1])

    def test_show_all_layers(self, fe_sd):
        shapes = fe_sd.show_all_layers()
        assert len(shapes) > 50
        assert 'unet-in' in shapes and 'mid-vit-block0-ffn-inner' in shapes
        assert not any('cross-k' in k or 'cross-v' in k for k in shapes)

    def test_accept_all_extract(self):
        fe = FeatureExtractor(layer=None, version='test-sd', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('x')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert len(feats) > 50

    def test_vae_out_pseudo_layer(self):
        fe = FeatureExtractor(layer={'vae-out': True}, version='test-sd',
                              img_size=64, dtype='float32')
        prompts = fe.encode_prompt('x')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert feats['vae-out'].shape == (1, 3, 64, 64)


class TestLayerValidation:
    def test_typo_raises_with_suggestion(self):
        # reference behavior is a silent drop (feature_extractor.py:36);
        # here a typo'd id must produce an actionable error up front
        with pytest.raises(ValueError) as ei:
            FeatureExtractor(
                layer={'mid-vit-block0-self-qq': True},
                version='test-sd', img_size=64, dtype='float32')
        msg = str(ei.value)
        assert 'mid-vit-block0-self-qq' in msg
        assert 'mid-vit-block0-self-q' in msg          # near-miss suggestion
        assert 'show_all_layers' in msg

    def test_pseudo_and_filtered_ids_pass(self):
        # 'vae-out'/'attn' are facade-assembled pseudo layers; cross-k/v are
        # store-filtered (both valid to request, neither in the enumeration)
        fe = FeatureExtractor(
            layer={'vae-out': True, 'attn': True,
                   'mid-vit-block0-cross-k': True},
            version='test-sd', img_size=64, dtype='float32',
            attention=['up_cross'], attn_store_sizes=(1, 8))
        assert fe.store_vae_output

    def test_validate_layers_false_skips(self):
        fe = FeatureExtractor(
            layer={'no-such-layer': True}, version='test-sd', img_size=64,
            dtype='float32', validate_layers=False)
        assert 'no-such-layer' in fe.taps.ids

    def test_attn_without_attention_arg_raises(self):
        # 'attn' is only assembled when attention categories are requested;
        # accepting it otherwise silently yields a missing feature
        with pytest.raises(ValueError) as ei:
            FeatureExtractor(layer={'attn': True}, version='test-sd',
                             img_size=64, dtype='float32')
        assert 'attention=' in str(ei.value)

    def test_vae_out_on_flux_raises(self):
        # flux's pipeline-driven path returns straight from the tap store
        # (reference :236-254) — there is no decode step to assemble vae-out
        with pytest.raises(ValueError) as ei:
            FeatureExtractor(layer={'vae-out': True}, version='test-flux',
                             img_size=64, dtype='float32')
        assert 'pipeline-driven' in str(ei.value)


class TestXL:
    def test_xl_extract_with_micro_conditioning(self):
        fe = FeatureExtractor(layer={'mid-vit-block0-cross-q': True},
                              version='test-xl', img_size=64, dtype='float32')
        prompts = fe.encode_prompt('a cat')
        pe, ne, pooled, neg_pooled = prompts
        assert pooled is not None          # dual-encoder pooled embeds
        assert pe.shape[-1] == 64          # concat of both encoders
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert 'mid-vit-block0-cross-q' in feats


class TestAttentionStorePseudoLayer:
    def test_attn_aggregation(self):
        # tiny VAE downsamples 2x (not 8x), so the default size band derived
        # from img_size misses every layer; override for the test topology
        fe = FeatureExtractor(layer={'mid-vit-block0-self-q': True},
                              version='test-sd', img_size=64, dtype='float32',
                              attention=['mid_cross', 'mid_self'],
                              attn_store_sizes=(2, 30))
        prompts = fe.encode_prompt('a cat')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert 'attn' in feats
        attn = feats['attn']
        # resized to (img//8)² and channel-concatenated
        assert attn.shape[-2:] == (64 // 8, 64 // 8)


class TestOffloadPromptEncoder:
    def test_nonpersistent_offload_reencodes(self):
        fe = FeatureExtractor(layer={'mid-vit-block0-self-q': True},
                              version='test-sd', img_size=64,
                              dtype='float32')
        before = np.asarray(fe.encode_prompt('a cat')[0])
        fe.offload_prompt_encoder()           # host round-trip, still usable
        after = np.asarray(fe.encode_prompt('a cat')[0])
        np.testing.assert_allclose(before, after, rtol=1e-6, atol=1e-6)

    def test_persistent_offload_raises_actionable(self):
        fe = FeatureExtractor(layer={'mid-vit-block0-self-q': True},
                              version='test-sd', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a cat')   # pre-encoded survives offload
        fe.offload_prompt_encoder(persistent=True)
        with pytest.raises(ValueError, match='offloaded persistently'):
            fe.encode_prompt('a cat')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert 'mid-vit-block0-self-q' in feats


class TestLongPrompt:
    def test_long_prompt_chunked(self, fe_sd):
        long_prompt = ' '.join(f'word{i}' for i in range(100))
        pe, ne, pooled, _ = fe_sd.encode_prompt(long_prompt)
        assert pe.shape[1] > 77 and pe.shape[1] % 77 == 0
        assert pe.shape[1] == ne.shape[1]


class TestBackgroundExtraction:
    def test_store_idx_api(self, fe_sd):
        fe_sd.set_background_extraction([1])
        prompts = fe_sd.encode_prompt('x')
        feats = fe_sd.extract(prompts, 1, [make_image()], t=50)
        bg = fe_sd.get_background_extraction()
        assert 'mid-vit-block0-self-q' in bg
        assert set(bg['mid-vit-block0-self-q'].keys()) == {1}
        fe_sd.store_idx = None


class TestEnsemble:
    def test_multi_timestep_concat(self, fe_sd):
        prompts = fe_sd.encode_prompt('a cat')
        feats = fe_sd.extract_ensemble(prompts, 1, [make_image(0)],
                                       ts=[50, 300])
        f = feats['up-level1-repeat0-res-out']
        single = fe_sd.extract(prompts, 1, [make_image(0)], t=50)
        assert f.shape[1] == 2 * single['up-level1-repeat0-res-out'].shape[1]

    def test_multi_prompt_cross(self, fe_sd):
        p1 = fe_sd.encode_prompt('a cat')
        p2 = fe_sd.encode_prompt('a dog')
        per = fe_sd.extract_ensemble(p1, 1, [make_image(0)], ts=[50],
                                     prompt_list=[p1, p2], concat=False)
        assert set(per) == {(0, 0), (0, 1)}


class TestExternalModel:
    def test_shared_params_new_tap_spec(self, fe_sd):
        # reference external_model semantics: share the pipe, re-instrument
        # with the NEW extractor's layer config (diffusion_feature.py:46-59)
        fe2 = FeatureExtractor(layer={'down-level0-repeat0-res-out': True},
                               version='test-sd', img_size=64,
                               dtype='float32', external_model=fe_sd)
        assert fe2.params is fe_sd.params          # weights shared
        prompts = fe2.encode_prompt('a cat')
        feats = fe2.extract(prompts, 1, [make_image()], t=50)
        assert set(feats) == {'down-level0-repeat0-res-out'}


class TestTGenericStep:
    """t travels as a runtime argument of ONE compiled program
    (facade._get_step_fn_generic): sweeping t must not multiply compiles,
    and the generic program must reproduce the per-t specialized one."""

    def _compare(self, version, layer, prompt_kind='tuple', t=250, **kw):
        fe = FeatureExtractor(layer=layer, version=version, img_size=64,
                              dtype='float32', **kw)
        fe.feature_dtype = None   # compare pre-bf16-store-cast fp32 values
        prompts = ('a probe' if prompt_kind == 'raw'
                   else fe.encode_prompt('a probe'))
        img = [make_image(3)]
        fe._rng = jax.random.PRNGKey(11)
        f_gen = fe.extract(prompts, 1, img, t=t)
        # force the per-t specialized path (the denoising_from/ddim builder)
        # on the same inputs and rng
        spec_fn = fe._get_step_fn(t, None, False, False)
        pe, enc_mask, pooled = None, None, None
        if fe.spec.family == 'pixart':
            pe, enc_mask, _, _ = prompts
            enc_mask = jnp.asarray(enc_mask, jnp.int32)
        elif fe.spec.clip_layer == 'penultimate':
            pe, _, pooled, _ = prompts
        else:
            pe = prompts[0]
        pe = jnp.asarray(pe, jnp.float32)
        if pooled is not None:
            pooled = jnp.asarray(pooled, jnp.float32)
        from diffusion_feature_tpu.io.images import preprocess_pil_batch
        arr = jnp.asarray(preprocess_pil_batch(img, 64), jnp.float32)
        rng = jax.random.split(jax.random.PRNGKey(11))[1]
        f_spec = spec_fn(fe.params, arr, pe, pooled, enc_mask, rng)
        assert set(f_gen) == set(f_spec)
        for k in f_gen:
            np.testing.assert_allclose(
                np.asarray(f_gen[k], np.float32),
                np.asarray(f_spec[k], np.float32),
                rtol=2e-5, atol=2e-5, err_msg=k)

    def test_matches_specialized_sd_pndm_with_vae_out(self):
        self._compare('test-sd', {'up-level1-repeat0-res-out': True,
                                  'vae-out': True})

    def test_matches_specialized_xl_euler(self):
        self._compare('test-xl', {'up-level1-repeat0-res-out': True,
                                  'vae-out': True})

    def test_matches_specialized_pixart_dpm(self):
        self._compare('test-pixart', {'vit-block0-out': True})

    def test_matches_specialized_if_ddpm(self):
        self._compare('test-if', {'up-level1-repeat0-res-out': True})

    def test_one_program_for_many_t(self):
        fe = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                              version='test-sd', img_size=64,
                              dtype='float32')
        prompts = fe.encode_prompt('a probe')
        img = [make_image(0)]
        fe.extract(prompts, 1, img, t=50)
        n_after_first = len(fe._fn_cache)
        for t in (100, 250, 400, 750):
            fe.extract(prompts, 1, img, t=t)
        assert len(fe._fn_cache) == n_after_first  # no per-t programs
        assert ('stepT', False) in fe._fn_cache


class TestDenoisingFromScan:
    """The denoising_from walk runs under lax.scan (same per-position
    machinery as the sampling loop); it must reproduce the unrolled
    sched.step walk exactly."""

    def _compare(self, version, layer, t, denoising_from, rtol=1e-4,
                 atol=1e-4):
        fe = FeatureExtractor(layer=layer, version=version, img_size=64,
                              dtype='float32')
        fe.feature_dtype = None
        prompts = fe.encode_prompt('a probe')
        pe, enc_mask, pooled = None, None, None
        if fe.spec.family == 'pixart':
            pe, enc_mask, _, _ = prompts
            enc_mask = jnp.asarray(enc_mask, jnp.int32)
        elif fe.spec.clip_layer == 'penultimate':
            pe, _, pooled, _ = prompts
        else:
            pe = prompts[0]
        pe = jnp.asarray(pe, jnp.float32)
        if pooled is not None:
            pooled = jnp.asarray(pooled, jnp.float32)
        from diffusion_feature_tpu.io.images import preprocess_pil_batch
        arr = jnp.asarray(preprocess_pil_batch([make_image(5)], 64),
                          jnp.float32)
        rng = jax.random.PRNGKey(13)
        fn_scan = fe._get_step_fn(t, denoising_from, False, False)
        fn_unroll = fe._get_step_fn(t, denoising_from, False, False,
                                    unroll_denoise=True)
        f1 = fn_scan(fe.params, arr, pe, pooled, enc_mask, rng)
        f2 = fn_unroll(fe.params, arr, pe, pooled, enc_mask, rng)
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_allclose(np.asarray(f1[k], np.float32),
                                       np.asarray(f2[k], np.float32),
                                       rtol=rtol, atol=atol, err_msg=k)

    def test_pndm_sd_long_span(self):
        # span > 50 -> 100-step schedule; walk crosses the full PLMS
        # 4-history blend
        self._compare('test-sd', {'up-level1-repeat0-res-out': True},
                      t=50, denoising_from=250)

    def test_euler_xl_short_span(self):
        # span <= 50 -> 1000-step schedule walk
        self._compare('test-xl', {'mid-vit-block0-cross-q': True},
                      t=50, denoising_from=80)

    def test_dpm_pixart(self):
        self._compare('test-pixart', {'vit-block0-out': True},
                      t=50, denoising_from=150)

    def test_ddpm_if(self):
        # short span: tight (measured 1.3e-05 at 20 steps).  IF's walk
        # starts near t=990 where 1/sqrt(acp)~100 and dynamic thresholding
        # clamps, so a ~94-step walk amplifies scan-vs-unrolled fusion
        # reassociation chaotically — the long span only sanity-checks at
        # loose tolerance (both runs are equally valid trajectories).
        self._compare('test-if', {'up-level1-repeat0-res-out': True},
                      t=50, denoising_from=90)

    def test_ddpm_if_long_walk_sane(self):
        self._compare('test-if', {'up-level1-repeat0-res-out': True},
                      t=50, denoising_from=150, rtol=0.05, atol=0.05)
