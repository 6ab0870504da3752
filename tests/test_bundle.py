"""Deployment bundles (io/bundle.py): the pre-converted param tree on disk
round-trips exactly through save_converted -> FeatureExtractor(weights=
<bundle>), including int8 kernels/scales, and configuration mismatches fail
with actionable errors instead of shape garbage."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor

# re-registers the synthetic SD checkpoint fixture (unet + vae + single
# CLIP with a preset-diverging config) for the unet-family bundle test
from test_checkpoint_load import checkpoint_dir  # noqa: F401


def _img(seed=0, size=64):
    return Image.fromarray(
        (np.random.RandomState(seed).rand(size, size, 3) * 255)
        .astype('uint8'))


@pytest.fixture(scope='module')
def flux_ckpt(tmp_path_factory):
    from synth_checkpoint import write_flux_checkpoint
    return write_flux_checkpoint(tmp_path_factory.mktemp('flux_ckpt'))


@pytest.fixture(scope='module')
def pixart_ckpt(tmp_path_factory):
    from synth_checkpoint import write_pixart_checkpoint
    return write_pixart_checkpoint(tmp_path_factory.mktemp('pixart_ckpt'))


KW = dict(layer={'vit-block0-out': True}, version='test-flux',
          img_size=64, dtype='float32')


class TestBundleRoundTrip:
    def test_flux_fp_roundtrip_exact(self, flux_ckpt, tmp_path):
        """bf16-off path: bundle load reproduces the checkpoint load's
        features exactly (same params, same program, same rng)."""
        fe1 = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                               t5_8bit=False, **KW)
        f1 = np.asarray(fe1.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle')
        assert os.path.isfile(os.path.join(bdir, 'tpu_bundle.json'))
        # the bundle behaves like a checkpoint dir: config.jsons copied
        assert os.path.isfile(os.path.join(bdir, 'transformer',
                                           'config.json'))
        fe2 = FeatureExtractor(weights=bdir, transformer_8bit=False,
                               t5_8bit=False, **KW)
        f2 = np.asarray(fe2.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_flux_int8_roundtrip(self, flux_ckpt, tmp_path):
        """Auto-int8 path (flux + weights): the quantized kernels and
        per-channel scales land in the bundle as int8/f32 and load back
        without re-quantizing."""
        fe1 = FeatureExtractor(weights=flux_ckpt, **KW)
        assert fe1.spec.dit.quantize_int8      # auto-on
        f1 = np.asarray(fe1.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle8')
        manifest = json.load(open(os.path.join(bdir, 'tpu_bundle.json')))
        assert manifest['meta']['transformer_8bit'] is True
        assert any(e['dtype'] == 'int8' for e in manifest['leaves'])
        fe2 = FeatureExtractor(weights=bdir, **KW)
        assert fe2.spec.dit.quantize_int8      # auto-on from bundle too
        import jax
        q_dtypes = {str(l.dtype) for l in
                    jax.tree_util.tree_leaves(fe2.params['unet'])}
        assert 'int8' in q_dtypes
        f2 = np.asarray(fe2.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_bf16_roundtrip_preserves_serving_dtype(self, flux_ckpt,
                                                    tmp_path):
        """bfloat16 is the facade/make_bundle default serving dtype: warm
        start must land the SAME leaf dtypes as cold start (a cast to the
        fp32 eval_shape template would silently double param memory) and
        identical features."""
        import jax
        kw = dict(KW, dtype='bfloat16')
        fe1 = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                               t5_8bit=False, **kw)

        def dtype_hist(params):
            hist = {}
            for leaf in jax.tree_util.tree_leaves(params):
                hist[str(leaf.dtype)] = hist.get(str(leaf.dtype), 0) + 1
            return hist

        cold = dtype_hist(fe1.params['unet'])
        assert set(cold) == {'bfloat16'}, cold
        f1 = np.asarray(fe1.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle_bf16')
        fe2 = FeatureExtractor(weights=bdir, transformer_8bit=False,
                               t5_8bit=False, **kw)
        assert dtype_hist(fe2.params['unet']) == cold
        assert dtype_hist(fe2.params['text'][0]) == dtype_hist(
            fe1.params['text'][0])
        f2 = np.asarray(fe2.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_bf16_int8_roundtrip_preserves_dtypes(self, flux_ckpt, tmp_path):
        """Auto-int8 at bf16 serving: int8 kernels, fp32 scales, and bf16
        leaves all survive the round trip unchanged."""
        import jax
        kw = dict(KW, dtype='bfloat16')
        fe1 = FeatureExtractor(weights=flux_ckpt, **kw)
        assert fe1.spec.dit.quantize_int8
        cold = {}
        for leaf in jax.tree_util.tree_leaves(fe1.params['unet']):
            cold[str(leaf.dtype)] = cold.get(str(leaf.dtype), 0) + 1
        assert 'int8' in cold and 'bfloat16' in cold, cold
        bdir = fe1.save_converted(tmp_path / 'bundle_bf16_int8')
        fe2 = FeatureExtractor(weights=bdir, **kw)
        warm = {}
        for leaf in jax.tree_util.tree_leaves(fe2.params['unet']):
            warm[str(leaf.dtype)] = warm.get(str(leaf.dtype), 0) + 1
        assert warm == cold
        f1 = np.asarray(fe1.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        f2 = np.asarray(fe2.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_fp_bundle_warm_starts_with_default_args(self, flux_ckpt,
                                                     tmp_path):
        """A bundle records its quantization flags in the manifest: auto
        (None) int8 args must resolve from it, not from the flux auto-int8
        heuristic — otherwise every bf16/fp-exported flux bundle (e.g.
        LoRA-merged, where int8 is forced off) fails to warm-start with
        default constructor arguments, the deployment-automation path."""
        fe1 = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                               t5_8bit=False, **KW)
        f1 = np.asarray(fe1.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle_fp')
        fe2 = FeatureExtractor(weights=bdir, **KW)   # no int8 args at all
        assert fe2.spec.dit.quantize_int8 is False
        assert not getattr(fe2.spec.t5, 'quantize_int8', False)
        f2 = np.asarray(fe2.extract('a photo', 1, [_img()], t=50)
                        ['vit-block0-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_sd_unet_family_roundtrip(self, checkpoint_dir, tmp_path):
        """U-Net family bundle: the 'unet' component config.json is copied
        (not 'transformer') and warm-start spec adaptation reads it — the
        checkpoint's CLIP intermediate_size diverges from the test-sd
        preset, so a missing config copy would mis-adapt."""
        kw = dict(layer={'up-level1-repeat0-res-out': True},
                  version='test-sd', img_size=64, dtype='float32')
        fe1 = FeatureExtractor(weights=checkpoint_dir, **kw)
        f1 = np.asarray(fe1.extract(fe1.encode_prompt('a photo'), 1,
                                    [_img()], t=50)
                        ['up-level1-repeat0-res-out'], np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle_sd')
        assert os.path.isfile(os.path.join(bdir, 'unet', 'config.json'))
        fe2 = FeatureExtractor(weights=bdir, **kw)
        assert fe2.spec.text_encoders[0].intermediate_size == 64
        f2 = np.asarray(fe2.extract(fe2.encode_prompt('a photo'), 1,
                                    [_img()], t=50)
                        ['up-level1-repeat0-res-out'], np.float32)
        np.testing.assert_array_equal(f1, f2)

    def test_pixart_roundtrip_exact(self, pixart_ckpt, tmp_path):
        kw = dict(layer={'vit-block0-out': True}, version='test-pixart',
                  img_size=64, dtype='float32')
        fe1 = FeatureExtractor(weights=pixart_ckpt, **kw)
        p = fe1.encode_prompt('a photo')
        f1 = np.asarray(fe1.extract(p, 1, [_img()], t=50)['vit-block0-out'],
                        np.float32)
        bdir = fe1.save_converted(tmp_path / 'bundle')
        fe2 = FeatureExtractor(weights=bdir, **kw)
        f2 = np.asarray(fe2.extract(fe2.encode_prompt('a photo'), 1,
                                    [_img()], t=50)['vit-block0-out'],
                        np.float32)
        np.testing.assert_array_equal(f1, f2)


class TestBundleGuards:
    def test_int8_bundle_into_fp_template_raises_actionable(
            self, flux_ckpt, tmp_path):
        fe1 = FeatureExtractor(weights=flux_ckpt, **KW)   # auto int8
        bdir = fe1.save_converted(tmp_path / 'bundle8')
        with pytest.raises(ValueError, match='transformer_8bit'):
            FeatureExtractor(weights=bdir, transformer_8bit=False,
                             t5_8bit=False, **KW)

    def test_lora_on_bundle_raises(self, flux_ckpt, tmp_path):
        fe1 = FeatureExtractor(weights=flux_ckpt, **KW)
        bdir = fe1.save_converted(tmp_path / 'bundle8')
        with pytest.raises(ValueError, match='bundle'):
            FeatureExtractor(weights=bdir, offline_lora='nonexistent', **KW)

    def test_cross_dtype_load_raises_actionable(self, flux_ckpt, tmp_path):
        """Bundles load as-stored; a serving-dtype mismatch must raise
        (re-export), not silently cast."""
        kw = dict(KW, dtype='bfloat16')
        fe1 = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                               t5_8bit=False, **kw)
        bdir = fe1.save_converted(tmp_path / 'bundle_bf16')
        with pytest.raises(ValueError, match='re-export'):
            FeatureExtractor(weights=bdir, transformer_8bit=False,
                             t5_8bit=False, **KW)   # KW serves float32

    def test_save_into_nonempty_dir_raises(self, flux_ckpt, tmp_path):
        """Overwriting an existing bundle would mix stale params/tokenizers
        with new ones — refuse instead."""
        fe1 = FeatureExtractor(weights=flux_ckpt, **KW)
        bdir = fe1.save_converted(tmp_path / 'bundle8')
        with pytest.raises(ValueError, match='not empty'):
            fe1.save_converted(bdir)

    def test_failed_export_leaves_nothing(self, flux_ckpt, tmp_path,
                                          monkeypatch):
        """save_bundle is all-or-nothing: a crash mid-export (disk full)
        must not leave a manifest-less half-bundle that blocks retries and
        takes the torch-checkpoint load path; the retry then succeeds."""
        fe = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                              t5_8bit=False, **KW)
        target = tmp_path / 'bundle_atomic'
        calls = {'n': 0}
        real_save = np.save

        def failing_save(path, arr):
            calls['n'] += 1
            if calls['n'] > 3:
                raise OSError('No space left on device (simulated)')
            return real_save(path, arr)

        monkeypatch.setattr(np, 'save', failing_save)
        with pytest.raises(OSError):
            fe.save_converted(target)
        monkeypatch.undo()
        assert not os.path.exists(target)
        assert not [d for d in os.listdir(tmp_path)
                    if d.startswith('bundle_atomic')]
        bdir = fe.save_converted(target)   # retry needs no manual cleanup
        assert os.path.isfile(os.path.join(bdir, 'tpu_bundle.json'))

    def test_tampered_leaf_raises_corrupt(self, flux_ckpt, tmp_path):
        """The manifest's per-leaf shape/dtype are cross-checked against
        the .npy actually on disk — out-of-band file replacement fails as
        'corrupt', not as a confusing configuration mismatch."""
        fe = FeatureExtractor(weights=flux_ckpt, transformer_8bit=False,
                              t5_8bit=False, **KW)
        bdir = fe.save_converted(tmp_path / 'bundle_tamper')
        manifest = json.load(open(os.path.join(bdir, 'tpu_bundle.json')))
        victim = os.path.join(bdir, manifest['leaves'][0]['file'])
        np.save(victim, np.zeros((1, 2, 3), np.float64))
        with pytest.raises(ValueError, match='corrupt'):
            FeatureExtractor(weights=bdir, transformer_8bit=False,
                             t5_8bit=False, **KW)

    def test_save_without_weights_raises(self, tmp_path):
        fe = FeatureExtractor(**KW)
        with pytest.raises(ValueError, match='real weights'):
            fe.save_converted(tmp_path / 'b')

    def test_save_after_persistent_offload_raises(self, flux_ckpt, tmp_path):
        fe = FeatureExtractor(weights=flux_ckpt, **KW)
        fe.offload_prompt_encoder(persistent=True)
        with pytest.raises(ValueError, match='offloaded'):
            fe.save_converted(tmp_path / 'b')
