"""Tests for the L4 tool layer: sampling + background extraction, the
visualization CLI, builtin layer configs, and the generate CLI plumbing."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from diffusion_feature_tpu import FeatureExtractor
from diffusion_feature_tpu.configs import (
    BUILTIN_CONFIGS, get_builtin_config, resolve_layer_config,
    write_config_json, edit_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBuiltinConfigs:
    def test_known_names(self):
        cfg = get_builtin_config('xl-practical')
        assert cfg == {'up-level0-repeat0-vit-block7-out': True,
                       'up-level0-repeat0-vit-block5-out': True,
                       'up-level1-repeat0-vit-block0-cross-q': True,
                       'up-level1-repeat0-vit-block0-out': True}
        assert len(BUILTIN_CONFIGS) >= 7

    def test_resolve_passthrough(self):
        assert resolve_layer_config({'a': True}) == {'a': True}
        assert resolve_layer_config(None) is None
        assert resolve_layer_config('15-legacy')['up-level0-upsampler-out']

    def test_write_and_edit(self, tmp_path):
        p = str(tmp_path / 'cfg.json')
        write_config_json('15-practical', p)
        cfg = edit_config(p, {'up-level1-repeat2-res-out': False})
        assert cfg['up-level1-repeat2-res-out'] is False
        assert json.load(open(p))['up-level1-repeat2-res-out'] is False


class TestSampling:
    def test_sample_with_background_extraction(self):
        fe = FeatureExtractor(layer={'mid-vit-block0-self-q': True},
                              version='test-sd', img_size=64, dtype='float32')
        fe.set_background_extraction([1, 3])
        prompts = fe.encode_prompt('a cat')
        images, feats = fe.sample(prompts, batch_size=1,
                                  num_inference_steps=4, guidance_scale=7.5)
        assert images.shape == (1, 3, 64, 64)
        assert np.asarray(images).min() >= 0 and np.asarray(images).max() <= 1
        # one encounter per U-Net call; PNDM/PLMS duplicates the second
        # timestep so 4 inference steps = 5 calls (reference scheduler parity)
        n_calls = len(fe.scheduler.set_timesteps(4).timesteps)
        assert len(feats['mid-vit-block0-self-q']) == n_calls == 5
        # CFG doubles the batch the store sees (reference parity)
        assert feats['mid-vit-block0-self-q'][0].shape[0] == 2
        bg = fe.get_background_extraction()
        assert set(bg['mid-vit-block0-self-q'].keys()) == {1, 3}
        fe.store_idx = None

    def test_sample_no_cfg(self):
        fe = FeatureExtractor(layer={'mid-vit-block0-self-q': True},
                              version='test-sd', img_size=64, dtype='float32')
        prompts = fe.encode_prompt('a cat')
        images, feats = fe.sample(prompts, batch_size=2,
                                  num_inference_steps=2, guidance_scale=1.0)
        assert images.shape == (2, 3, 64, 64)
        assert feats['mid-vit-block0-self-q'][0].shape[0] == 2  # no doubling


class TestVisualizationCLI:
    def test_pca_blocks_and_attn_heatmaps(self, tmp_path):
        feat = np.random.RandomState(0).rand(16 + 6, 8, 8).astype(np.float32)
        fpath = str(tmp_path / 'layer.npy')
        np.save(fpath, feat)
        out = str(tmp_path / 'viz')
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, 'feature_visualization.py'),
             fpath, '--output_dir', out, '--block_divide', '8', '8',
             '--attn_blocks', '8:6', '--upscale', '1'],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        files = os.listdir(out)
        assert 'layer_block0.png' in files and 'layer_block1.png' in files
        assert sum(1 for f in files if 'attn0_tok' in f) == 6


class TestXLSampling:
    def test_xl_cfg_micro_conditioning_path(self):
        # CFG doubles the batch; pooled embeds concat [neg; pos] and
        # time_ids follow (facade added_cond in _get_sample_fn)
        fe = FeatureExtractor(layer={'mid-vit-block0-cross-q': True},
                              version='test-xl', img_size=64, dtype='float32')
        prompts = fe.encode_prompt('a cat')
        images, feats = fe.sample(prompts, batch_size=1,
                                  num_inference_steps=2, guidance_scale=5.0)
        assert images.shape == (1, 3, 64, 64)
        assert np.isfinite(np.asarray(images, np.float32)).all()
        assert feats['mid-vit-block0-cross-q'][0].shape[0] == 2  # CFG batch
