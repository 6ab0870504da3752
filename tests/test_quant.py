"""int8 weight-only T5 quantization (reference parity: Flux's T5-XXL loads
in 8-bit via bitsandbytes, feature/components/models.py:158-163)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_feature_tpu.ops.quant import (
    Int8Dense, dequantize_int8, quantize_int8,
)


class TestQuantizeInt8:
    def test_roundtrip_error_bounded(self):
        rng = np.random.RandomState(0)
        w = rng.randn(64, 32).astype(np.float32)
        q, s = quantize_int8(w)
        assert q.dtype == np.int8 and s.shape == (32,)
        back = np.asarray(dequantize_int8(jnp.asarray(q), jnp.asarray(s)))
        # absmax symmetric: error bounded by half a quantization step/channel
        step = np.abs(w).max(axis=0) / 127.0
        assert (np.abs(back - w) <= step[None, :] * 0.5 + 1e-7).all()

    def test_zero_column_safe(self):
        w = np.zeros((8, 4), np.float32)
        q, s = quantize_int8(w)
        assert (q == 0).all() and (s == 1.0).all()

    def test_int8_dense_matches_manual(self):
        rng = np.random.RandomState(1)
        w = rng.randn(16, 8).astype(np.float32)
        q, s = quantize_int8(w)
        layer = Int8Dense(8)
        x = rng.randn(2, 5, 16).astype(np.float32)
        params = {'kernel_q': jnp.asarray(q), 'scale': jnp.asarray(s)}
        out = layer.apply({'params': params}, jnp.asarray(x))
        want = x @ (q.astype(np.float32) * s[None, :])
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


class TestQuantizedT5:
    @pytest.fixture(scope='class')
    def torch_t5(self):
        import torch
        from transformers import T5Config as HFT5Config, T5EncoderModel
        torch.manual_seed(0)
        cfg = HFT5Config(vocab_size=1000, d_model=32, d_kv=8, d_ff=64,
                         num_layers=2, num_heads=4, feed_forward_proj='gated-gelu')
        return T5EncoderModel(cfg).eval()

    def _convert(self, torch_t5, quantize):
        import dataclasses
        from diffusion_feature_tpu.models.t5 import (
            T5EncoderModel, tiny_t5_config)
        from diffusion_feature_tpu.models.convert import (
            convert_torch_state, rename_t5_keys)
        cfg = dataclasses.replace(tiny_t5_config(), quantize_int8=quantize)
        model = T5EncoderModel(cfg=cfg)
        ids = jnp.zeros((1, 16), jnp.int32)
        template = model.init(jax.random.PRNGKey(0), ids)['params']
        state = rename_t5_keys(
            {k: v.detach().numpy() for k, v in torch_t5.state_dict().items()})
        params, missing, _ = convert_torch_state(state, template)
        return model, params

    def test_quantized_encoder_close_to_fp32(self, torch_t5):
        m32, p32 = self._convert(torch_t5, quantize=False)
        m8, p8 = self._convert(torch_t5, quantize=True)
        # projections really are int8 + per-channel scales
        q = p8['block_0']['attn']['q']
        assert set(q) == {'kernel_q', 'scale'}
        assert q['kernel_q'].dtype == jnp.int8
        ids = jnp.asarray(np.random.RandomState(2).randint(0, 1000, (2, 16)))
        out32 = np.asarray(m32.apply({'params': p32}, ids), np.float32)
        out8 = np.asarray(m8.apply({'params': p8}, ids), np.float32)
        cos = (out32 * out8).sum() / (
            np.linalg.norm(out32) * np.linalg.norm(out8))
        assert cos > 0.995, f'cosine {cos}'

    def test_projection_bytes_quartered(self, torch_t5):
        _, p32 = self._convert(torch_t5, quantize=False)
        _, p8 = self._convert(torch_t5, quantize=True)

        def kernels_bytes(tree, names):
            return sum(leaf.size * leaf.dtype.itemsize
                       for kp, leaf in jax.tree_util.tree_leaves_with_path(tree)
                       if any(n in jax.tree_util.keystr(kp) for n in names))

        b32 = kernels_bytes(p32, ('kernel',))
        b8 = kernels_bytes(p8, ('kernel_q', 'scale'))
        # f32 kernels -> int8 + tiny f32 scales: ~4x smaller (2x vs bf16
        # production weights — T5-XXL: 9.4 GiB bf16 -> 4.7 GiB int8)
        assert b8 < b32 * 0.3, (b8, b32)


class TestFacadeT5Quant:
    def test_flux_random_init_stays_fp(self):
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=32,
                              dtype='float32')
        assert fe.spec.t5.quantize_int8 is False

    def test_t5_8bit_flag_forces_quantized_modules(self):
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=32,
                              dtype='float32', t5_8bit=True)
        assert fe.spec.t5.quantize_int8 is True
        flat = jax.tree_util.tree_leaves_with_path(fe.params['text'][1])
        assert any('kernel_q' in jax.tree_util.keystr(kp) for kp, _ in flat)
