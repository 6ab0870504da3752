"""Segmentation task tests: losses, heads, end-to-end segmentor training
step + sliding-window inference on the tiny offline model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from diffusion_feature_tpu.tasks.segmentation import (
    DiffusionSegmentor, FCNHead, UPerHead,
    cross_entropy_loss, lovasz_softmax_loss, segmentation_loss,
)


class TestLosses:
    def test_ce_ignores_index(self):
        logits = jnp.zeros((1, 3, 2, 2))
        labels = jnp.full((1, 2, 2), 255)
        assert float(cross_entropy_loss(logits, labels)) == 0.0

    def test_ce_perfect_prediction_low(self):
        labels = jnp.asarray(np.random.RandomState(0).randint(0, 3, (1, 4, 4)))
        logits = jax.nn.one_hot(labels, 3).transpose(0, 3, 1, 2) * 100.0
        assert float(cross_entropy_loss(logits, labels)) < 1e-3

    def test_lovasz_perfect_vs_wrong(self):
        labels = jnp.asarray(np.random.RandomState(0).randint(0, 3, (1, 8, 8)))
        perfect = jax.nn.one_hot(labels, 3).transpose(0, 3, 1, 2) * 100.0
        wrong = jax.nn.one_hot((labels + 1) % 3, 3).transpose(0, 3, 1, 2) * 100.0
        lp = float(lovasz_softmax_loss(perfect, labels))
        lw = float(lovasz_softmax_loss(wrong, labels))
        assert lp < 0.01 and lw > 0.5

    def test_lovasz_with_ignore(self):
        labels = jnp.asarray([[[0, 255], [1, 255]]])
        logits = jnp.zeros((1, 2, 2, 2))
        l = float(lovasz_softmax_loss(logits, labels))
        assert np.isfinite(l)

    def test_lovasz_matches_naive_argsort_value_and_grad(self):
        """The production sort-transport formulation (losses.py:62-80 —
        stop_gradient'd lax.sort pipeline, dot with the permutation-inverted
        Jaccard weights) must equal the textbook argsort+gather Lovasz in
        VALUE and in dL/d(logits), including tied errors and ignored pixels.
        The weights are piecewise-constant in the errors, so the a.e.
        gradient of both formulations is the weight vector itself."""
        def naive(logits, labels, ignore_index=255):
            b, c, h, w = logits.shape
            probs = jax.nn.softmax(
                logits.transpose(0, 2, 3, 1).reshape(-1, c).astype(
                    jnp.float32), axis=-1)
            lb = labels.reshape(-1)
            valid = (lb != ignore_index)
            lb_safe = jnp.where(valid, lb, 0)

            def per_class(cls):
                fg = ((lb_safe == cls) & valid).astype(jnp.float32)
                present = fg.sum() > 0
                errors = jnp.abs(fg - probs[:, cls]) * valid.astype(
                    jnp.float32)
                order = jnp.argsort(-errors)
                from diffusion_feature_tpu.tasks.segmentation.losses import (
                    _lovasz_grad)
                loss_c = jnp.sum(
                    errors[order]
                    * jax.lax.stop_gradient(_lovasz_grad(fg[order])))
                return jnp.where(present, loss_c, 0.0), present

            losses, present = jax.vmap(per_class)(jnp.arange(c))
            return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1)

        rng = np.random.RandomState(7)
        logits = rng.randn(2, 4, 6, 6).astype(np.float32)
        # force exact error ties: duplicate one spatial row of logits
        logits[:, :, 3] = logits[:, :, 1]
        labels = rng.randint(0, 4, (2, 6, 6))
        labels[:, 3] = labels[:, 1]
        labels[0, 0, :3] = 255            # ignored pixels
        labels[:, 5] = 3                  # and one class absent from batch 1
        logits = jnp.asarray(logits)
        labels = jnp.asarray(labels)

        v_new, g_new = jax.value_and_grad(lovasz_softmax_loss)(logits, labels)
        v_old, g_old = jax.value_and_grad(naive)(logits, labels)
        assert np.isclose(float(v_new), float(v_old), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                                   rtol=1e-5, atol=1e-7)

    def test_combined_loss_parts(self):
        labels = jnp.asarray(np.random.RandomState(0).randint(0, 3, (1, 4, 4)))
        logits = jnp.asarray(np.random.RandomState(1).randn(1, 3, 4, 4),
                             jnp.float32)
        total, parts = segmentation_loss(logits, logits, labels)
        expect = (parts['loss_ce'] + parts['loss_lovasz']
                  + 0.4 * parts['loss_ce_aux'])
        assert np.isclose(float(total), float(expect))


class TestHeads:
    def test_uperhead_shapes(self):
        head = UPerHead(in_channels=(16, 32), channels=24, pool_scales=(1, 2),
                        num_classes=5)
        x = [jnp.zeros((2, 16, 16, 16)), jnp.zeros((2, 32, 8, 8))]
        vars_ = head.init(jax.random.PRNGKey(0), x, train=False)
        out = head.apply(vars_, x, train=False)
        assert out.shape == (2, 5, 16, 16)     # finest input resolution

    def test_fcnhead_shapes(self):
        head = FCNHead(channels=24, num_classes=5)
        x = jnp.zeros((2, 32, 8, 8))
        vars_ = head.init(jax.random.PRNGKey(0), x, train=False)
        out = head.apply(vars_, x, train=False)
        assert out.shape == (2, 5, 8, 8)


@pytest.fixture(scope='module')
def seg():
    return DiffusionSegmentor(
        diffusion_feature={'layer': {'up-level1-repeat0-res-out': True,
                                     'mid-vit-block0-self-q': True},
                           'version': 'test-sd', 'attention': None,
                           'img_size': 64, 't': [50, 100],
                           'train_unet': False, 'dtype': 'float32'},
        feature_layers=[[('up-level1-repeat0-res-out', 32)],
                        [('mid-vit-block0-self-q', 64)]],
        num_classes=4, head_channels=16, pool_scales=(1, 2),
        prompt='a scene')


class TestSegmentor:
    def test_train_step_decreases_loss(self, seg):
        params, bs = seg.init_state()
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1)
        labels = jnp.asarray(rng.randint(0, 4, (2, 64, 64)))
        opt = optax.adamw(1e-2)
        opt_state = opt.init(params)

        def loss_fn(p, bs, key):
            total, (parts, new_bs) = seg.loss(p, bs, images, labels, key)
            return total, new_bs

        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(4):
            key, dk = jax.random.split(key)
            (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, dk)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(l))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_zero_init_adapters_are_identity(self, seg):
        params, bs = seg.init_state()
        # adapter output == input at init (reference zero-init, :35-38)
        from diffusion_feature_tpu.tasks.segmentation import ResBlockAdapter
        a = ResBlockAdapter(8)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 4, 4), jnp.float32)
        v = a.init(jax.random.PRNGKey(0), x, train=False)
        out = a.apply(v, x, train=False)
        assert np.allclose(np.asarray(out), np.asarray(x))

    def test_slide_inference(self, seg):
        params, bs = seg.init_state()
        images = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 96, 96).astype(np.float32))
        pred = seg.predict(params, bs, images, mode='slide',
                           crop_size=(64, 64), stride=(32, 32))
        assert pred.shape == (1, 96, 96)
        assert pred.max() < 4

    def test_multi_model_ensemble(self):
        # Ours-XL-t-style dual-extractor wiring (reference :155-183):
        # per-model adapters/sums, per-level amalgamated block
        seg2 = DiffusionSegmentor(
            diffusion_feature=[
                {'layer': {'up-level1-repeat0-res-out': True},
                 'version': 'test-sd', 'attention': None, 'img_size': 64,
                 't': 50, 'dtype': 'float32'},
                {'layer': {'up-level1-repeat0-res-out': True},
                 'version': 'test-sd', 'attention': None, 'img_size': 64,
                 't': 100, 'dtype': 'float32'},
            ],
            feature_layers=[[[('up-level1-repeat0-res-out', 32)]],
                            [[('up-level1-repeat0-res-out', 32)]]],
            num_classes=3, head_channels=16, pool_scales=(1, 2),
            prompt='a scene')
        params, bs = seg2.init_state()
        assert 'amalgamated0' in params['head']
        assert 'adapter_m0_up_level1_repeat0_res_out' in params['head']
        images = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
        logits = seg2.predict_logits(params, bs, images)
        assert logits.shape == (1, 3, 64, 64)

    def test_test_time_uses_first_t(self, seg):
        assert seg._pick_t(is_test=True) == 50
        ts = {seg._pick_t(is_test=False) for _ in range(20)}
        assert ts <= {50, 100} and len(ts) == 2


class TestPromptTuning:
    def test_meta_prompt_receives_gradients(self):
        """prompt_tuning=True replaces the prompt embeds with trainable
        tensors whose gradients flow through the jitted extraction step
        (reference diffusion_segmentor.py:109-126, ade_vpd config)."""
        seg = DiffusionSegmentor(
            diffusion_feature={'layer': {'up-level1-repeat0-res-out': True},
                               'version': 'test-sd', 'attention': None,
                               'img_size': 64, 't': 50,
                               'train_unet': False, 'dtype': 'float32'},
            feature_layers=[[('up-level1-repeat0-res-out', 32)]],
            num_classes=3, head_channels=16, pool_scales=(1, 2),
            prompt='wall building sky', prompt_tuning=True)
        params, bs = seg.init_state()
        assert 'meta_prompt' in params
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 3, (1, 64, 64)))

        def loss_fn(p):
            total, _ = seg.loss(p, bs, images, labels, jax.random.PRNGKey(0))
            return total

        grads = jax.grad(loss_fn)(params)
        g = float(jnp.linalg.norm(grads['meta_prompt'].astype(jnp.float32)))
        assert np.isfinite(g) and g > 0
