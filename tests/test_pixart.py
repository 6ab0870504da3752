"""PixArt family tests (tiny random-init config, offline).

Reference behaviors: encode_prompt returns the raw 4-tuple with attention
masks (diffusion_feature.py:195-202); extraction is one DiT forward with the
DPM-Solver img2img timestep; taps vit-block{i}-{out,self-*,cross-*,ffn-inner}
(DiT walk, feature_extractor.py:250-287); learned-sigma output halved by the
facade before any scheduler step."""

import numpy as np
import pytest
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


@pytest.fixture(scope='module')
def fe_px():
    return FeatureExtractor(
        layer={'vit-block0-out': True,
               'vit-block1-self-q': True,
               'vit-block1-cross-map': True,
               'vit-block0-ffn-inner': True},
        version='test-pixart', img_size=64, dtype='float32')


class TestPixArtExtract:
    def test_prompt_contract_and_extract(self, fe_px):
        prompts = fe_px.encode_prompt('a cat')
        pe, mask, ne, nmask = prompts
        assert mask.shape[-1] == 24           # prompt_max_length
        feats = fe_px.extract(prompts, 2, [make_image(0), make_image(1)], t=50)
        assert set(feats) == {'vit-block0-out', 'vit-block1-self-q',
                              'vit-block1-cross-map', 'vit-block0-ffn-inner'}
        # tiny vae 2x: 64 -> 32 latent, patch 2 -> 16x16 tokens
        assert feats['vit-block0-out'].shape == (2, 16, 16, 16)
        cm = feats['vit-block1-cross-map']
        assert cm.shape == (2, 2, 256, 24)    # B, H, S_img, S_text
        assert np.isfinite(np.asarray(feats['vit-block0-out'],
                                      np.float32)).all()

    def test_attention_store(self):
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-pixart', img_size=64,
                              dtype='float32',
                              attention=['up_cross', 'up_self'],
                              attn_store_sizes=(2, 30))
        prompts = fe.encode_prompt('a cat')
        feats = fe.extract(prompts, 1, [make_image()], t=50)
        assert 'attn' in feats
        assert feats['attn'].shape[-2:] == (8, 8)

    def test_timestep_changes_features(self, fe_px):
        prompts = fe_px.encode_prompt('a cat')
        img = [make_image(0)]
        f1 = fe_px.extract(prompts, 1, img, t=50)
        f2 = fe_px.extract(prompts, 1, img, t=500)
        a = np.asarray(f1['vit-block0-out'], np.float32)
        b = np.asarray(f2['vit-block0-out'], np.float32)
        assert not np.allclose(a, b)

    def test_show_all_layers(self, fe_px):
        shapes = fe_px.show_all_layers()
        assert 'vit-block0-ffn-inner' in shapes
        assert 'vit-block1-out' in shapes
        assert not any('cross-k' in k or 'cross-v' in k for k in shapes)
