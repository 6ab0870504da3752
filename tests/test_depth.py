"""Depth ControlNet preprocessing: our Flax DPT vs transformers
DPTForDepthEstimation (golden numerics), checkpoint-dir loading, and the
facade-level depth residual-injection path (VERDICT round-1 item 6;
reference semantics feature/components/controlnet.py:65-78)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_feature_tpu.models.depth import (
    DPTConfig, DPTDepthModel, convert_dpt_state, tiny_dpt_config,
)

TINY = dict(hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
            intermediate_size=64, patch_size=8, image_size=64,
            backbone_out_indices=[0, 1, 2, 3],
            neck_hidden_sizes=[16, 24, 32, 32],
            reassemble_factors=[4, 2, 1, 0.5], fusion_hidden_size=16,
            is_hybrid=False, readout_type='project')


def make_torch_dpt():
    import torch
    from transformers import DPTConfig as HFDPTConfig
    from transformers import DPTForDepthEstimation
    torch.manual_seed(0)
    cfg = HFDPTConfig(**TINY)
    model = DPTForDepthEstimation(cfg).eval()
    # non-degenerate weights: the head ReLUs zero out default-init outputs
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return model


@pytest.fixture(scope='module')
def torch_dpt():
    return make_torch_dpt()


@pytest.fixture(scope='module')
def converted(torch_dpt):
    cfg = tiny_dpt_config()
    ours = DPTDepthModel(cfg=cfg)
    template = ours.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, 64, 64)))['params']
    state = {k: v.detach().numpy() for k, v in torch_dpt.state_dict().items()}
    params, unused = convert_dpt_state(state, template)
    return ours, params, unused


class TestDPTGolden:
    def test_conversion_consumes_all_relevant_keys(self, converted):
        _, _, unused = converted
        # only params torch also never executes may remain: the pooler /
        # final-LN, and fusion layer 0's residual_layer1 (torch instantiates
        # it but the deepest fusion layer gets residual=None at runtime)
        assert all('pooler' in k or 'layernorm.' in k
                   or k.startswith('fusion_0_res1.') for k in unused), unused

    def test_depth_forward_matches_transformers(self, torch_dpt, converted):
        import torch
        ours, params, _ = converted
        x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
        got = np.asarray(ours.apply({'params': params}, jnp.asarray(x)))
        with torch.no_grad():
            want = torch_dpt(torch.tensor(x)).predicted_depth.numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_variable_input_size_pos_embed_interp(self, torch_dpt, converted):
        """MiDaS handles arbitrary input sizes by interpolating position
        embeddings — both frameworks must agree off the native 64^2 grid."""
        import torch
        ours, params, _ = converted
        x = np.random.RandomState(1).randn(1, 3, 96, 96).astype(np.float32)
        got = np.asarray(ours.apply({'params': params}, jnp.asarray(x)))
        with torch.no_grad():
            want = torch_dpt(torch.tensor(x)).predicted_depth.numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestDepthEstimatorDir:
    @pytest.fixture()
    def depth_dir(self, tmp_path, torch_dpt):
        from safetensors.numpy import save_file
        d = tmp_path / 'depth_estimator'
        d.mkdir()
        with open(d / 'config.json', 'w') as f:
            json.dump(dict(TINY, model_type='dpt'), f)
        save_file({k: v.detach().numpy().copy()
                   for k, v in torch_dpt.state_dict().items()},
                  str(d / 'model.safetensors'))
        return str(d)

    def test_estimator_loads_and_normalizes(self, depth_dir):
        from PIL import Image
        from diffusion_feature_tpu.models.depth import DPTDepthEstimator
        est = DPTDepthEstimator(depth_dir)
        img = Image.fromarray(
            (np.random.RandomState(2).rand(80, 80, 3) * 255).astype('uint8'))
        out = est(img)
        assert out.shape == (3, 80, 80)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.allclose(out[0], out[1])          # grayscale replicated

    def test_facade_depth_residual_injection(self, depth_dir):
        """Mirror of the canny test: depth control changes the extracted
        features under a pinned noise draw (residuals actually injected)."""
        from PIL import Image
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'up-level1-repeat0-res-out': True},
                              version='test-sd', img_size=64,
                              dtype='float32',
                              control=[('depth', depth_dir)])
        # zero-init output convs make residuals zero at random init: nudge
        cn = fe.params['controlnet'][0]
        cn['controlnet_mid_block']['kernel'] = (
            cn['controlnet_mid_block']['kernel'] + 0.05)
        prompts = fe.encode_prompt('a cat')
        img = [Image.fromarray((np.random.RandomState(3).rand(80, 80, 3)
                                * 255).astype('uint8'))]
        fe._rng = jax.random.PRNGKey(5)
        f_ctrl = fe.extract(prompts, 1, img, t=50, use_control=True)
        fe._rng = jax.random.PRNGKey(5)
        f_none = fe.extract(prompts, 1, img, t=50, use_control=False)
        a = np.asarray(f_ctrl['up-level1-repeat0-res-out'], np.float32)
        b = np.asarray(f_none['up-level1-repeat0-res-out'], np.float32)
        assert a.shape == b.shape
        assert not np.allclose(a, b), 'depth residuals had no effect'

    def test_missing_depth_dir_raises(self):
        from diffusion_feature_tpu import FeatureExtractor
        with pytest.raises(FileNotFoundError, match='depth estimator'):
            FeatureExtractor(layer={'unet-out': True}, version='test-sd',
                             img_size=64, dtype='float32', control=['depth'])

    def test_hybrid_rejected(self):
        with pytest.raises(NotImplementedError, match='hybrid'):
            DPTConfig.from_diffusers_config(dict(TINY, is_hybrid=True))
