"""Flux family tests (tiny random-init config, offline).

Covers the reference's Flux tap surface (SURVEY §2.4/§2.5):
dual blocks ('vit-block0..1'): out / norm-out / q / k / v / cross-map /
self-map / attn-out / ffn-inner; single blocks continue the index.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor
from diffusion_feature_tpu.models.flux import (
    pack_latents, unpack_latents, rope_cos_sin, make_img_ids,
)


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 8, 8), jnp.float32)
        packed = pack_latents(x)
        assert packed.shape == (2, 16, 16)
        back = unpack_latents(packed, 8, 8)
        assert np.allclose(np.asarray(back), np.asarray(x))

    def test_rope_tables(self):
        ids = np.concatenate([np.zeros((4, 3), np.float32), make_img_ids(8, 8)])
        cos, sin = rope_cos_sin(ids, (2, 2, 4))
        assert cos.shape == (4 + 16, 8) and sin.shape == (4 + 16, 8)
        # text ids are all-zero -> cos=1, sin=0
        assert np.allclose(cos[:4], 1.0) and np.allclose(sin[:4], 0.0)


@pytest.fixture(scope='module')
def fe_flux():
    return FeatureExtractor(
        layer={'vit-block0-out': True,          # dual block
               'vit-block0-norm-out': True,
               'vit-block0-q': True,
               'vit-block0-cross-map': True,
               'vit-block0-self-map': True,
               'vit-block0-attn-out': True,
               'vit-block0-ffn-inner': True,
               'vit-block2-out': True,          # single block (index continues)
               'vit-block3-q': True},
        version='test-flux', img_size=64, dtype='float32')


class TestFluxExtract:
    def test_tap_surface(self, fe_flux):
        feats = fe_flux.extract('a cat', 2, [make_image(0), make_image(1)],
                                t=500)
        expected = {'vit-block0-out', 'vit-block0-norm-out', 'vit-block0-q',
                    'vit-block0-cross-map', 'vit-block0-self-map',
                    'vit-block0-attn-out', 'vit-block0-ffn-inner',
                    'vit-block2-out', 'vit-block3-q'}
        assert set(feats) == expected
        # tiny vae: 64 -> 32 latent -> 16x16 token grid
        out = feats['vit-block0-out']
        assert out.shape == (2, 16, 16, 16)    # B, C(inner=16), 16, 16
        # single-block taps are text-sliced to image tokens only
        assert feats['vit-block2-out'].shape == (2, 16, 16, 16)
        assert feats['vit-block3-q'].shape == (2, 16, 16, 16)
        # score-map splits: cross is image x text, self is image x image
        cm = feats['vit-block0-cross-map']
        sm = feats['vit-block0-self-map']
        assert cm.shape == (2, 2, 256, 16)     # B, H, S_img, S_txt
        assert sm.shape == (2, 2, 256, 256)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_encoded_prompt_tuple_also_accepted(self, fe_flux):
        prompts = fe_flux.encode_prompt('a dog')
        feats = fe_flux.extract(prompts, 1, [make_image(2)], t=500)
        assert 'vit-block0-out' in feats

    def test_timestep_changes_features(self, fe_flux):
        img = [make_image(0)]
        f1 = fe_flux.extract('a cat', 1, img, t=100)
        f2 = fe_flux.extract('a cat', 1, img, t=900)
        a = np.asarray(f1['vit-block0-out'], np.float32)
        b = np.asarray(f2['vit-block0-out'], np.float32)
        assert not np.allclose(a, b)

    def test_attention_store_aggregation(self):
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=64,
                              dtype='float32', attention=['up_cross'],
                              attn_store_sizes=(2, 30))
        feats = fe.extract('a cat', 1, [make_image()], t=500)
        assert 'attn' in feats
        assert feats['attn'].shape[-2:] == (8, 8)   # img//8

    def test_show_all_layers(self, fe_flux):
        shapes = fe_flux.show_all_layers()
        # 2 dual + 2 single blocks, full tap surface enumerable without weights
        assert 'vit-block0-norm-out' in shapes
        assert 'vit-block3-out' in shapes
        assert 'vit-block0-ffn-inner' in shapes
