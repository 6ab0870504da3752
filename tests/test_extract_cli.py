"""End-to-end tests for the extract_feature.py CLI (reference
extract_feature.py), driven in-process via main(argv).

Pins the output layout on disk and the trailing-batch padding contract:
a final batch smaller than --batch_size is padded by repeating the last
image (keeping the compiled program's static batch shape) and the padding
is sliced off before the dump.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import extract_feature  # noqa: E402
from diffusion_feature_tpu import FeatureExtractor  # noqa: E402

LAYER = 'up-level1-repeat0-res-out'
LAYER_JSON = '{"%s": true}' % LAYER


def _write_images(d, n):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = d / f'img{i}.png'
        Image.fromarray(
            (rng.rand(64, 64, 3) * 255).astype('uint8')).save(p)
        paths.append(p)
    return paths


class TestExtractCLI:
    def test_trailing_batch_padded_and_sliced(self, tmp_path):
        paths = _write_images(tmp_path / 'in', 3)
        out = tmp_path / 'out'
        extract_feature.main([
            '--layer', LAYER_JSON, '--version', 'test-sd',
            '--dtype', 'float32', '--img_size', '64', '--batch_size', '2',
            '--input_dir', str(tmp_path / 'in' / '*.png'),
            '--prompt', 'a photo', '--output_dir', str(out),
            '--use_original_filename',
        ])
        # default layout: outdir/layer/name.npy, one per input image
        files = sorted((out / LAYER).glob('*.npy'))
        assert [f.name for f in files] == ['img0.npy', 'img1.npy',
                                           'img2.npy']

        # the trailing batch [img2] was padded to [img2, img2]; the dump
        # must hold the real image's feature, identical to what the facade
        # produces for the same call sequence
        fe = FeatureExtractor(layer={LAYER: True}, version='test-sd',
                              img_size=64, dtype='float32', seed=0)
        prompts = fe.encode_prompt('a photo')
        ims = [Image.open(p).convert('RGB') for p in paths]
        fe.extract(prompts, 2, ims[:2], t=50)  # advance rng like batch 0
        want = np.asarray(fe.extract(prompts, 2, [ims[2], ims[2]],
                                     t=50)[LAYER])[0]
        got = np.load(files[2])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_single_image_smaller_than_batch(self, tmp_path):
        _write_images(tmp_path / 'in', 1)
        out = tmp_path / 'out'
        extract_feature.main([
            '--layer', LAYER_JSON, '--version', 'test-sd',
            '--dtype', 'float32', '--img_size', '64', '--batch_size', '4',
            '--input_dir', str(tmp_path / 'in' / '*.png'),
            '--prompt', 'a photo', '--output_dir', str(out),
            '--use_original_filename',
        ])
        files = sorted((out / LAYER).glob('*.npy'))
        assert [f.name for f in files] == ['img0.npy']
        arr = np.load(files[0])
        assert arr.ndim == 3 and np.isfinite(arr).all()

    def test_dp_indivisible_batch_rounds_up(self, tmp_path, capsys):
        # --batch_size 3 with --dp 2 rounds up to 4 (the trailing-batch
        # pad-and-slice absorbs the surplus slot) instead of silently
        # falling back to replicated execution
        paths = _write_images(tmp_path / 'in', 3)
        out = tmp_path / 'out'
        extract_feature.main([
            '--layer', LAYER_JSON, '--version', 'test-sd',
            '--dtype', 'float32', '--img_size', '64', '--batch_size', '3',
            '--dp', '2',
            '--input_dir', str(tmp_path / 'in' / '*.png'),
            '--prompt', 'a photo', '--output_dir', str(out),
            '--use_original_filename',
        ])
        assert 'rounding up to 4' in capsys.readouterr().err
        files = sorted((out / LAYER).glob('*.npy'))
        assert [f.name for f in files] == ['img0.npy', 'img1.npy',
                                           'img2.npy']
        for f in files:
            assert np.isfinite(np.load(f)).all()

    def test_unknown_layer_id_raises(self, tmp_path):
        _write_images(tmp_path / 'in', 1)
        with pytest.raises(ValueError, match='unknown/unavailable layer id'):
            extract_feature.main([
                '--layer', '{"up-level1-repeat0-res-oot": true}',
                '--version', 'test-sd', '--dtype', 'float32',
                '--img_size', '64',
                '--input_dir', str(tmp_path / 'in' / '*.png'),
                '--prompt', 'a photo',
                '--output_dir', str(tmp_path / 'out'),
            ])
