"""Model-layer tests: tap grammar enumeration, attention parity, weight
conversion round-trip, CLIP/VAE shape contracts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_feature_tpu.taps import TapSpec, flatten_taps
from diffusion_feature_tpu.models.unet2d import (
    UNet2DConditionModel, tiny_unet_config,
)
from diffusion_feature_tpu.models.vae import AutoencoderKL, tiny_vae_config
from diffusion_feature_tpu.models.clip_text import CLIPTextModel, tiny_clip_config
from diffusion_feature_tpu.ops.attention import (
    attention_with_probs, attention_fused,
)


@pytest.fixture(scope='module')
def tiny_unet():
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg=cfg, taps=TapSpec.all())
    sample = jnp.zeros((1, 4, 16, 16))
    ctx = jnp.zeros((1, 8, 32))
    variables = UNet2DConditionModel(cfg=cfg).init(
        jax.random.PRNGKey(0), sample, 50, ctx)
    return model, variables['params'], sample, ctx


class TestUNetTaps:
    def test_tap_grammar_complete(self, tiny_unet):
        model, params, sample, ctx = tiny_unet
        out, state = model.apply({'params': params}, sample, 50, ctx,
                                 mutable=['taps'])
        flat = flatten_taps(state['taps'])
        ids = set(flat)
        # reference grammar (feature_extractor.py:125-249) for this topology
        expected_subset = {
            'unet-in', 'unet-after-conv-in', 'unet-out',
            'down-level0-repeat0-res-increment', 'down-level0-repeat0-res-out',
            'down-level0-repeat0-vit-out',
            'down-level0-repeat0-vit-block0-out',
            'down-level0-repeat0-vit-block0-self-q',
            'down-level0-repeat0-vit-block0-self-k',
            'down-level0-repeat0-vit-block0-self-v',
            'down-level0-repeat0-vit-block0-self-map',
            'down-level0-repeat0-vit-block0-cross-q',
            'down-level0-repeat0-vit-block0-cross-map',
            'down-level0-repeat0-vit-block0-ffn-inner',
            'down-level0-downsampler-out',
            'mid-repeat0-res-out', 'mid-repeat1-res-out', 'mid-vit-out',
            'mid-vit-block0-out',
            'up-level0-repeat0-res-out', 'up-level0-upsampler-out',
            'up-level1-repeat0-vit-block0-cross-q',
            'up-level1-repeat1-res-out',
        }
        assert expected_subset <= ids, expected_subset - ids
        # cross-k / cross-v never captured
        assert not any('cross-k' in i or 'cross-v' in i for i in ids)
        # every tap fires exactly once per forward
        assert all(not isinstance(v, tuple) for v in flat.values())

    def test_selected_taps_only(self, tiny_unet):
        model, params, sample, ctx = tiny_unet
        spec = TapSpec.from_config({'mid-vit-block0-self-q': True})
        sel = UNet2DConditionModel(cfg=model.cfg, taps=spec)
        out, state = sel.apply({'params': params}, sample, 50, ctx,
                               mutable=['taps'])
        flat = flatten_taps(state['taps'])
        assert set(flat) == {'mid-vit-block0-self-q'}

    def test_no_taps_no_collection(self, tiny_unet):
        model, params, sample, ctx = tiny_unet
        sel = UNet2DConditionModel(cfg=model.cfg)
        out, state = sel.apply({'params': params}, sample, 50, ctx,
                               mutable=['taps'])
        assert flatten_taps(state.get('taps', {})) == {}

    def test_output_deterministic_wrt_tap_selection(self, tiny_unet):
        """Capturing taps must not change the model function."""
        model, params, sample, ctx = tiny_unet
        x = jax.random.normal(jax.random.PRNGKey(1), sample.shape)
        plain = UNet2DConditionModel(cfg=model.cfg)
        o1 = plain.apply({'params': params}, x, 50, ctx)
        o2, _ = model.apply({'params': params}, x, 50, ctx, mutable=['taps'])
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-2, atol=2e-3)

    def test_xl_added_cond(self):
        cfg = tiny_unet_config(cross_dim=64, with_xl_embeds=True)
        model = UNet2DConditionModel(cfg=cfg)
        sample = jnp.zeros((1, 4, 16, 16))
        ctx = jnp.zeros((1, 8, 64))
        added = {'text_embeds': jnp.zeros((1, 32)),
                 'time_ids': jnp.zeros((1, 6))}
        params = model.init(jax.random.PRNGKey(0), sample, 50, ctx, added)['params']
        out = model.apply({'params': params}, sample, 50, ctx, added)
        assert out.shape == (1, 4, 16, 16)
        assert 'add_embedding' in params


class TestAttention:
    def test_map_tap_is_softmax_probs(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        k = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        v = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        out, probs = attention_with_probs(q, k, v, heads=2)
        assert probs.shape == (2, 2, 16, 16)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)

    def test_fused_matches_explicit(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        k = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
        v = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
        o1, _ = attention_with_probs(q, k, v, heads=4)
        o2 = attention_fused(q, k, v, heads=4)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_torch_sdpa(self):
        """Oracle: the reference's my_scaled_dot_product_attention
        (components/attention.py:265-292)."""
        import torch
        rng = np.random.RandomState(3)
        B, H, S, D = 2, 2, 16, 8
        qn = rng.randn(B, H, S, D).astype(np.float32)
        kn = rng.randn(B, H, S, D).astype(np.float32)
        vn = rng.randn(B, H, S, D).astype(np.float32)
        tq, tk, tv = map(torch.from_numpy, (qn, kn, vn))
        t_out = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
        qm = jnp.asarray(qn.transpose(0, 2, 1, 3).reshape(B, S, H * D))
        km = jnp.asarray(kn.transpose(0, 2, 1, 3).reshape(B, S, H * D))
        vm = jnp.asarray(vn.transpose(0, 2, 1, 3).reshape(B, S, H * D))
        out, probs = attention_with_probs(qm, km, vm, heads=H)
        ours = np.asarray(out).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(ours, t_out.numpy(), rtol=1e-4, atol=1e-5)


class TestWeightConversion:
    def test_unet_roundtrip_via_diffusers_names(self):
        """Build a synthetic torch-style state dict using diffusers key names
        derived from our tree, convert, and verify values land in place."""
        from diffusion_feature_tpu.models.convert import convert_torch_state
        from flax import traverse_util
        cfg = tiny_unet_config()
        model = UNet2DConditionModel(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)),
                            50, jnp.zeros((1, 8, 32)))['params']
        flat = traverse_util.flatten_dict(params)
        rng = np.random.RandomState(0)
        state = {}
        for path, val in flat.items():
            leafmap = {'kernel': 'weight', 'scale': 'weight',
                       'embedding': 'weight', 'bias': 'bias'}
            torch_key = '.'.join(path[:-1]).replace('_', '.') \
                if False else None
            # build diffusers-style key: module path with '.', indices split
            segs = []
            for seg in path[:-1]:
                m = seg.rsplit('_', 1)
                if len(m) == 2 and m[1].isdigit():
                    segs.extend([m[0], m[1]])
                else:
                    segs.append(seg)
            key = '.'.join(segs + [leafmap[path[-1]]])
            arr = rng.randn(*val.shape).astype(np.float32)
            t = arr
            if path[-1] == 'kernel':
                t = arr.T if arr.ndim == 2 else arr.transpose(3, 2, 0, 1)
            state[key] = t
        converted, missing, unused = convert_torch_state(state, params)
        assert not missing and not unused
        cflat = traverse_util.flatten_dict(converted)
        for path, val in flat.items():
            assert cflat[path].shape == val.shape
        # spot-check a transposed linear round-trips exactly
        p = ('mid_block', 'attentions_0', 'transformer_blocks_0', 'attn1',
             'to_q', 'kernel')
        key = 'mid.block.attentions.0.transformer.blocks.0.attn1.to.q.weight'
        # our derived key uses underscores split only on trailing indices:
        key = 'mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight'
        np.testing.assert_allclose(np.asarray(cflat[p]), state[key].T)


class TestVAE:
    def test_encode_decode_shapes(self):
        vae = AutoencoderKL(cfg=tiny_vae_config())
        img = jnp.zeros((2, 3, 32, 32))
        params = vae.init(jax.random.PRNGKey(0), img,
                          method=AutoencoderKL.full_pass)['params']
        z = vae.apply({'params': params}, img, jax.random.PRNGKey(1))
        assert z.shape == (2, 4, 16, 16)
        rec = vae.apply({'params': params},
                        z / vae.cfg.scaling_factor,
                        method=AutoencoderKL.decode)
        assert rec.shape == (2, 3, 32, 32)

    def test_posterior_sampling_uses_rng(self):
        vae = AutoencoderKL(cfg=tiny_vae_config())
        img = jnp.ones((1, 3, 32, 32))
        params = vae.init(jax.random.PRNGKey(0), img,
                          method=AutoencoderKL.full_pass)['params']
        z1 = vae.apply({'params': params}, img, jax.random.PRNGKey(1))
        z2 = vae.apply({'params': params}, img, jax.random.PRNGKey(2))
        zm = vae.apply({'params': params}, img, sample=False)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))
        assert np.isfinite(np.asarray(zm)).all()


class TestCLIP:
    def test_hidden_states_and_pooled(self):
        cfg = tiny_clip_config(32, projection_dim=16)
        model = CLIPTextModel(cfg=cfg)
        ids = jnp.asarray([[1, 5, 7, cfg.eos_token_id, 0, 0]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)['params']
        last, pooled, hidden = model.apply({'params': params}, ids)
        assert last.shape == (1, 6, 32)
        assert pooled.shape == (1, 16)          # projected
        assert len(hidden) == cfg.num_hidden_layers + 1
        assert hidden[-2].shape == (1, 6, 32)

    def test_causal_mask(self):
        """Changing a later token must not affect earlier positions."""
        cfg = tiny_clip_config(32)
        model = CLIPTextModel(cfg=cfg)
        ids1 = jnp.asarray([[1, 5, 7, 9]], jnp.int32)
        ids2 = jnp.asarray([[1, 5, 8, 9]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids1)['params']
        h1 = model.apply({'params': params}, ids1)[2][-1]
        h2 = model.apply({'params': params}, ids2)[2][-1]
        np.testing.assert_allclose(np.asarray(h1[:, :2]), np.asarray(h2[:, :2]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(h1[:, 2]), np.asarray(h2[:, 2]))
