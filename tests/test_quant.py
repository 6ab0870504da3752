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


def _quantize_fp_tree(fp_params, template):
    """Walk the int8 template; wherever a 'kernel_q' leaf sits, quantize the
    fp32 'kernel' at the same path (what models/convert.py does on the fly
    for checkpoint tensors)."""
    from flax import traverse_util
    flat_fp = traverse_util.flatten_dict(fp_params)
    out = dict(traverse_util.flatten_dict(template))
    for path in out:
        if path[-1] == 'kernel_q':
            k = np.asarray(flat_fp[path[:-1] + ('kernel',)], np.float32)
            q, s = quantize_int8(k)
            out[path] = jnp.asarray(q)
            out[path[:-1] + ('scale',)] = jnp.asarray(s)
        elif path in flat_fp:
            out[path] = flat_fp[path]
    return traverse_util.unflatten_dict(out)


class TestQuantizedFluxTransformer:
    """int8 weight-only flux block projections: the single-chip path for the
    12B flagship (bf16 23.8 GiB > one v5e's HBM; int8 halves it)."""

    def _models(self):
        import dataclasses
        from diffusion_feature_tpu.models.flux import (
            FluxTransformer2D, tiny_flux_config)
        cfg32 = tiny_flux_config()
        cfg8 = dataclasses.replace(cfg32, quantize_int8=True)
        kw = dict(grid_hw=(4, 4), text_len=8)
        return (FluxTransformer2D(cfg=cfg32, **kw),
                FluxTransformer2D(cfg=cfg8, **kw), cfg32)

    def test_quantized_forward_close_to_fp32(self):
        m32, m8, cfg = self._models()
        rng = jax.random.PRNGKey(0)
        packed = jax.random.normal(rng, (2, 16, cfg.in_channels))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                                (2, 8, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.fold_in(rng, 2),
                                   (2, cfg.pooled_projection_dim))
        p32 = m32.init(rng, packed, 500.0, ctx, pooled)['params']
        template = m8.init(rng, packed, 500.0, ctx, pooled)['params']
        p8 = _quantize_fp_tree(p32, template)
        # block projections really are int8
        q = p8['transformer_blocks_0']['attn']['to_q']
        assert q['kernel_q'].dtype == jnp.int8 and 'bias' in q
        out32 = np.asarray(m32.apply({'params': p32}, packed, 500.0, ctx,
                                     pooled), np.float32)
        out8 = np.asarray(m8.apply({'params': p8}, packed, 500.0, ctx,
                                   pooled), np.float32)
        cos = (out32 * out8).sum() / (
            np.linalg.norm(out32) * np.linalg.norm(out8) + 1e-12)
        assert cos > 0.99, f'cosine {cos}'

    def test_taps_survive_quantization(self):
        from diffusion_feature_tpu.taps import TapSpec, flatten_taps
        m32, m8, cfg = self._models()
        taps = TapSpec.from_config({'vit-block0-out': True,
                                    'vit-block0-q': True,
                                    'vit-block2-out': True})
        m32 = m32.clone(taps=taps)
        m8 = m8.clone(taps=taps)
        rng = jax.random.PRNGKey(3)
        packed = jax.random.normal(rng, (1, 16, cfg.in_channels))
        ctx = jax.random.normal(rng, (1, 8, cfg.joint_attention_dim))
        pooled = jax.random.normal(rng, (1, cfg.pooled_projection_dim))
        p32 = m32.init(rng, packed, 500.0, ctx, pooled)['params']
        template = m8.init(rng, packed, 500.0, ctx, pooled)['params']
        p8 = _quantize_fp_tree(p32, template)
        _, st32 = m32.apply({'params': p32}, packed, 500.0, ctx, pooled,
                            mutable=['taps'])
        _, st8 = m8.apply({'params': p8}, packed, 500.0, ctx, pooled,
                          mutable=['taps'])
        f32 = flatten_taps(st32['taps'])
        f8 = flatten_taps(st8['taps'])
        assert set(f32) == set(f8) == {'vit-block0-out', 'vit-block0-q',
                                       'vit-block2-out'}
        for k in f32:
            a = np.asarray(f32[k], np.float32).ravel()
            b = np.asarray(f8[k], np.float32).ravel()
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            assert cos > 0.99, f'{k}: cosine {cos}'


class TestFluxCheckpointQuant:
    """Full tiny-Flux checkpoint -> facade load: spec adaptation from every
    component's config.json, torch-state conversion with on-the-fly int8
    quantization (auto for flux+weights), and extraction parity between the
    int8 and fp paths."""

    @pytest.fixture(scope='class')
    def flux_ckpt(self, tmp_path_factory):
        from synth_checkpoint import write_flux_checkpoint
        return write_flux_checkpoint(tmp_path_factory.mktemp('flux_ckpt'))

    def test_auto_int8_and_parity_with_fp(self, flux_ckpt):
        from PIL import Image
        from diffusion_feature_tpu import FeatureExtractor
        kw = dict(layer={'vit-block0-out': True, 'vit-block2-out': True},
                  version='flux', img_size=32, dtype='float32',
                  weights=flux_ckpt)
        fe8 = FeatureExtractor(**kw)
        # adapted everywhere: tiny dit/t5/clip/vae from the checkpoint configs
        assert fe8.spec.dit.num_layers == 2
        assert fe8.spec.t5.d_model == 32
        assert fe8.spec.text_encoders[0].hidden_size == 32
        # int8 auto-on (flux + weights + no mesh/LoRA), both transformer & T5
        assert fe8.spec.dit.quantize_int8 is True
        assert fe8.spec.t5.quantize_int8 is True
        q = fe8.params['unet']['transformer_blocks_0']['attn']['to_q']
        assert q['kernel_q'].dtype == jnp.int8

        fe32 = FeatureExtractor(transformer_8bit=False, t5_8bit=False, **kw)
        assert fe32.spec.dit.quantize_int8 is False

        img = [Image.fromarray((np.random.RandomState(0).rand(32, 32, 3)
                                * 255).astype('uint8'))]
        fe8._rng = jax.random.PRNGKey(7)
        fe32._rng = jax.random.PRNGKey(7)
        f8 = fe8.extract(fe8.encode_prompt('a dog'), 1, img, t=500)
        f32 = fe32.extract(fe32.encode_prompt('a dog'), 1, img, t=500)
        assert set(f8) == set(f32) == {'vit-block0-out', 'vit-block2-out'}
        for k in f8:
            a = np.asarray(f32[k], np.float32).ravel()
            b = np.asarray(f8[k], np.float32).ravel()
            assert np.isfinite(b).all(), k
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                   + 1e-12)
            assert cos > 0.98, f'{k}: cosine {cos}'


class TestFacadeFluxQuant:
    def test_transformer_8bit_without_weights_rejected(self):
        from diffusion_feature_tpu import FeatureExtractor
        with pytest.raises(ValueError, match='weights'):
            FeatureExtractor(layer={'vit-block0-out': True},
                             version='test-flux', img_size=32,
                             dtype='float32', transformer_8bit=True)

    def test_random_init_defaults_to_fp(self):
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=32,
                              dtype='float32')
        assert fe.spec.dit.quantize_int8 is False

    def test_rejected_for_non_flux(self):
        from diffusion_feature_tpu import FeatureExtractor
        with pytest.raises(ValueError, match='flux'):
            FeatureExtractor(layer={'unet-out': True}, version='test-sd',
                             img_size=32, dtype='float32',
                             transformer_8bit=True)

    def test_explicit_int8_with_lora_rejected(self, tmp_path):
        """LoRA deltas merge into full-precision kernels; silently dropping
        them on kernel_q layers would be wrong — must raise."""
        from diffusion_feature_tpu import FeatureExtractor
        with pytest.raises(ValueError, match='offline_lora'):
            FeatureExtractor(layer={'vit-block0-out': True},
                             version='test-flux', img_size=32,
                             dtype='float32', transformer_8bit=True,
                             offline_lora=str(tmp_path))


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason='needs a 4-device mesh (KEEP_PLATFORM runs on '
                           'the single real chip; the virtual CPU mesh '
                           'covers these)')
class TestFluxQuantMeshRules:
    """Auto-int8 must key on whether the weights are actually tp-sharded:
    a dp/sp-only mesh still replicates the full tree per chip (code-review
    finding: 'any mesh' disabled quantization and OOM'd dp-only flux)."""

    @pytest.fixture(scope='class')
    def flux_ckpt(self, tmp_path_factory):
        from synth_checkpoint import write_flux_checkpoint
        return write_flux_checkpoint(tmp_path_factory.mktemp('flux_ckpt_m'))

    def test_dp_only_mesh_keeps_auto_int8(self, flux_ckpt):
        from diffusion_feature_tpu import FeatureExtractor
        from diffusion_feature_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
        fe = FeatureExtractor(layer={'vit-block0-out': True}, version='flux',
                              img_size=32, dtype='float32',
                              weights=flux_ckpt, mesh=mesh)
        assert fe.spec.dit.quantize_int8 is True

    def test_tp_mesh_disables_auto_int8(self, flux_ckpt):
        from diffusion_feature_tpu import FeatureExtractor
        from diffusion_feature_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        fe = FeatureExtractor(layer={'vit-block0-out': True}, version='flux',
                              img_size=32, dtype='float32',
                              weights=flux_ckpt, mesh=mesh)
        assert fe.spec.dit.quantize_int8 is False

    def test_explicit_int8_with_tp_shards_and_matches(self, flux_ckpt):
        """Explicit transformer_8bit=True on a tp mesh: kernel_q leaves must
        actually shard over tp (int8 layers follow the same col/row rules as
        fp kernels; per-output-channel scales follow the output axis) and
        features must match the single-device int8 extraction."""
        from PIL import Image
        from jax.sharding import PartitionSpec as P
        from flax import traverse_util
        from diffusion_feature_tpu import FeatureExtractor
        from diffusion_feature_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        kw = dict(layer={'vit-block0-out': True}, version='flux',
                  img_size=32, dtype='float32', weights=flux_ckpt)
        fe_tp = FeatureExtractor(mesh=mesh, transformer_8bit=True, **kw)
        assert fe_tp.spec.dit.quantize_int8 is True
        fe_1 = FeatureExtractor(**kw)
        imgs = [Image.fromarray((np.random.RandomState(i).rand(32, 32, 3)
                                 * 255).astype('uint8')) for i in range(2)]
        fe_tp._rng = jax.random.PRNGKey(5)
        fe_1._rng = jax.random.PRNGKey(5)
        f1 = fe_tp.extract('a dog', 2, imgs, t=500)
        f2 = fe_1.extract('a dog', 2, imgs, t=500)
        a = np.asarray(f1['vit-block0-out'], np.float32)
        b = np.asarray(f2['vit-block0-out'], np.float32)
        assert np.allclose(a, b, rtol=0.02, atol=0.02)
        placed = fe_tp._placed_params[1]
        flat = {'/'.join(k): v for k, v in
                traverse_util.flatten_dict(placed['unet']).items()}
        q = flat['transformer_blocks_0/attn/to_q/kernel_q']
        assert q.sharding.spec == P(None, 'tp')
        s = flat['transformer_blocks_0/attn/to_q/scale']
        assert s.sharding.spec == P('tp')


class TestFacadeT5Quant:
    def test_flux_random_init_stays_fp(self):
        from diffusion_feature_tpu import FeatureExtractor
        fe = FeatureExtractor(layer={'vit-block0-out': True},
                              version='test-flux', img_size=32,
                              dtype='float32')
        assert fe.spec.t5.quantize_int8 is False

    def test_t5_8bit_without_weights_rejected(self):
        """int8 kernels init to zeros — a random-init quantized encoder is
        degenerate, so the flag demands real weights (the structure/parity
        checks with weights live in TestFluxCheckpointQuant)."""
        from diffusion_feature_tpu import FeatureExtractor
        with pytest.raises(ValueError, match='weights'):
            FeatureExtractor(layer={'vit-block0-out': True},
                             version='test-flux', img_size=32,
                             dtype='float32', t5_8bit=True)
