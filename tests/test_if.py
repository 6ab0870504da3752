"""DeepFloyd-IF family tests (tiny random-init config, offline, pixel-space).

Reference quirks under test (SURVEY §2.2/§2.5 + feature_extractor.py walk):
  - pixel-space path: no VAE, latents are the preprocessed image itself
    (diffusion_feature.py:377-380)
  - resnet-based down/upsamplers tap as
    ``down-level{L}-downsampler-{increment,out}``
  - NO attention taps fire (AttnAddedKVProcessor is untapped in the overlay)
"""

import numpy as np
import pytest
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor


def make_image(seed=0, size=48):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


@pytest.fixture(scope='module')
def fe_if():
    return FeatureExtractor(
        layer={'down-level1-repeat0-res-out': True,
               'down-level0-downsampler-out': True,
               'up-level0-repeat1-res-increment': True,
               'unet-out': True},
        version='test-if', img_size=32, dtype='float32')


class TestIFExtract:
    def test_pixel_space_extract(self, fe_if):
        prompts = fe_if.encode_prompt('a cat')
        pe, ne, pooled, _ = prompts
        assert pooled is None                      # 2-tuple contract
        feats = fe_if.extract(prompts, 2, [make_image(0), make_image(1)], t=200)
        assert set(feats) == {'down-level1-repeat0-res-out',
                              'down-level0-downsampler-out',
                              'up-level0-repeat1-res-increment',
                              'unet-out'}
        # pixel space: level-0 features at half the IMAGE resolution (not /8)
        d = feats['down-level0-downsampler-out']
        assert d.shape == (2, 32, 16, 16)
        # learned-range variance: 2x channels on the prediction
        assert feats['unet-out'].shape == (2, 6, 32, 32)
        assert np.isfinite(np.asarray(d, np.float32)).all()

    def test_no_attention_taps_in_enumeration(self, fe_if):
        shapes = fe_if.show_all_layers()
        assert 'down-level0-downsampler-increment' in shapes
        assert 'unet-in' in shapes
        # AddedKV attention is untapped in the reference overlay
        assert not any('-vit-' in k or '-self-' in k or '-cross-' in k
                       for k in shapes)

    def test_prompt_conditions_features(self, fe_if):
        img = [make_image(0)]
        p1 = fe_if.encode_prompt('a cat')
        p2 = fe_if.encode_prompt('a very different dog entirely')
        f1 = fe_if.extract(p1, 1, img, t=200)
        f2 = fe_if.extract(p2, 1, img, t=200)
        a = np.asarray(f1['up-level0-repeat1-res-increment'], np.float32)
        b = np.asarray(f2['up-level0-repeat1-res-increment'], np.float32)
        assert not np.allclose(a, b)


class TestIFSampling:
    def test_pixel_space_generation_with_learned_variance(self, fe_if):
        prompts = fe_if.encode_prompt('a cat')
        images, feats = fe_if.sample(prompts, batch_size=1,
                                     num_inference_steps=3,
                                     guidance_scale=7.0)
        assert images.shape == (1, 3, 32, 32)
        arr = np.asarray(images, np.float32)
        assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1
        assert len(feats['unet-out']) == 3


class TestDDPMVariance:
    def test_learned_range_split_and_thresholding(self):
        import jax.numpy as jnp
        from diffusion_feature_tpu.schedulers.diffusion import DDPMScheduler
        from diffusion_feature_tpu.schedulers import SchedulerConfig
        import jax
        cfg = SchedulerConfig(beta_schedule='squaredcos_cap_v2',
                              beta_start=0.0001, beta_end=0.02,
                              variance_type='learned_range', thresholding=True)
        sched = DDPMScheduler(cfg)
        state = sched.set_timesteps(10)
        t = int(state.timesteps[0])
        rngs = jax.random.split(jax.random.PRNGKey(0), 3)
        sample = jax.random.normal(rngs[0], (2, 3, 8, 8))
        out = jax.random.normal(rngs[1], (2, 6, 8, 8))   # 2x channels
        noise = jax.random.normal(rngs[2], (2, 3, 8, 8))
        prev, _ = sched.step(state, out, t, sample, noise)
        assert prev.shape == (2, 3, 8, 8)
        assert np.isfinite(np.asarray(prev)).all()
