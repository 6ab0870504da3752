"""Multi-chip extraction: batch sharded over a dp mesh (virtual 8-device CPU
mesh, conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
from PIL import Image

from diffusion_feature_tpu import FeatureExtractor
from diffusion_feature_tpu.parallel.mesh import make_mesh


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


class TestMeshExtraction:
    def test_dp_sharded_extract_matches_unsharded(self):
        mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
        fe_mesh = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                                   version='test-sd', img_size=64,
                                   dtype='float32', mesh=mesh, seed=0)
        fe_plain = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                                    version='test-sd', img_size=64,
                                    dtype='float32', seed=0)
        prompts = fe_plain.encode_prompt('a cat')
        imgs = [make_image(i) for i in range(4)]
        fe_mesh._rng = jax.random.PRNGKey(7)
        fe_plain._rng = jax.random.PRNGKey(7)
        f1 = fe_mesh.extract(prompts, 4, imgs, t=50)
        f2 = fe_plain.extract(prompts, 4, imgs, t=50)
        a = np.asarray(f1['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f2['up-level1-repeat0-res-out'], np.float32)
        assert a.shape == b.shape == (4, 32, 32, 32)
        # same params/rng -> numerically matching features across the mesh
        assert np.allclose(a, b, rtol=0.02, atol=0.02)

    def test_output_is_dp_sharded(self):
        mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
        fe = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                              version='test-sd', img_size=64,
                              dtype='float32', mesh=mesh)
        prompts = fe.encode_prompt('a cat')
        f = fe.extract(prompts, 4, [make_image(i) for i in range(4)], t=50)
        arr = f['up-level1-repeat0-res-out']
        assert len(arr.sharding.device_set) == 4   # lives across the mesh


class TestScarceViz:
    def test_save_predictions_colorized(self, tmp_path):
        from diffusion_feature_tpu.tasks.scarce.data import (
            save_predictions, get_palette, colorize_mask)
        pal = get_palette(5)
        assert pal.shape == (5, 3) and (pal[0] == 0).all()
        m = np.random.RandomState(0).randint(0, 5, (8, 8))
        c = colorize_mask(m, pal)
        assert c.shape == (8, 8, 3)
        names = save_predictions([m], str(tmp_path), 5, ['x'])
        import os
        assert os.path.exists(tmp_path / 'predictions' / 'x.png')
        assert os.path.exists(tmp_path / 'visualizations' / 'x.png')
