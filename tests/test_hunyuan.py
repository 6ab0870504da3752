"""HunyuanDiT family tests (tiny random-init config, offline).

Reference tap surface for Hunyuan (SURVEY §2.4): vit-block{i}-self-{q,k,v,map},
-cross-{q,k,v,map}, -ffn-inner.  Block-level '-out' deliberately absent
(HunyuanDiTBlock is not an overlaid file in the reference).
"""

import numpy as np
import pytest
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


@pytest.fixture(scope='module')
def fe_hy():
    return FeatureExtractor(
        layer={'vit-block0-self-q': True,
               'vit-block0-cross-map': True,
               'vit-block1-ffn-inner': True,
               'vit-block3-self-v': True},   # skip-connected second-half block
        version='test-hunyuan', img_size=64, dtype='float32')


class TestHunyuanExtract:
    def test_tap_surface(self, fe_hy):
        feats = fe_hy.extract('a cat', 2, [make_image(0), make_image(1)], t=200)
        assert set(feats) == {'vit-block0-self-q', 'vit-block0-cross-map',
                              'vit-block1-ffn-inner', 'vit-block3-self-v'}
        # tiny vae 2x downsample: 64 -> 32 latent, patch 2 -> 16x16 tokens
        q = feats['vit-block0-self-q']
        assert q.shape == (2, 32, 16, 16)
        cm = feats['vit-block0-cross-map']
        # cross map: B, H, S_img, S_text(8 bert + 8 t5)
        assert cm.shape == (2, 2, 256, 16)
        assert np.isfinite(np.asarray(q, np.float32)).all()

    def test_no_block_out_tap(self, fe_hy):
        shapes = fe_hy.show_all_layers()
        assert 'vit-block0-self-q' in shapes
        assert 'vit-block0-ffn-inner' in shapes
        # reference quirk: HunyuanDiTBlock has no 'out' gather
        assert 'vit-block0-out' not in shapes

    def test_prompt_conditions_features(self, fe_hy):
        img = [make_image(0)]
        f1 = fe_hy.extract('a cat', 1, img, t=200)
        f2 = fe_hy.extract('an entirely different dog', 1, img, t=200)
        a = np.asarray(f1['vit-block0-cross-map'], np.float32)
        b = np.asarray(f2['vit-block0-cross-map'], np.float32)
        assert not np.allclose(a, b)

    def test_attention_store(self):
        fe = FeatureExtractor(layer={'vit-block0-self-q': True},
                              version='test-hunyuan', img_size=64,
                              dtype='float32', attention=['up_cross', 'up_self'],
                              attn_store_sizes=(2, 30))
        feats = fe.extract('a cat', 1, [make_image()], t=200)
        assert 'attn' in feats
        assert feats['attn'].shape[-2:] == (8, 8)
