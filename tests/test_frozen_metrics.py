"""Pinned end-to-end task-metric regressions (VERDICT round-1 item 7).

The reference validates through task metrics on real datasets (SURVEY §4);
none are runnable offline, so these tests freeze the exact metric floats the
full task loops produce on deterministic synthetic fixtures with the test-sd
architecture twin.  Any silent numeric drift in the extractor, adapters,
heads, or losses moves these values and fires here, long before a real
SPair/ADE20K run would.

Values were produced on the virtual CPU mesh (conftest pins fp32 matmuls);
the tolerance is tight enough that a GroupNorm epsilon, weight-conversion
transpose, or scheduler off-by-one (all >>1e-2 metric shifts) cannot hide.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from PIL import Image

from diffusion_feature_tpu.tasks.correspondence import (
    AggregationNetwork, compute_pck, find_nn_source_correspondences,
)
from diffusion_feature_tpu.tasks.scarce import (
    compute_iou, predict_labels, train_ensemble,
)


def make_image(seed, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


class TestFrozenCorrespondencePCK:
    def test_pck_value_frozen(self):
        net = AggregationNetwork(
            configs=[{'layer': {'up-level1-repeat0-res-out': True},
                      'version': 'test-sd', 'img_size': 64, 't': 5,
                      'feature_len': 32, 'dtype': 'float32'}],
            output_size=(32, 32), seed=0)
        params = net.init_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        arr = (rng.rand(64, 64, 3) * 255).astype('uint8')
        img1 = Image.fromarray(arr)
        # same image rolled 8px under the SAME rng: the shared posterior
        # noise field anchors most matches to the source coordinates while
        # the shifted content perturbs the rest — a deterministic hit/miss
        # mix whose PCK moves under any feature-numerics drift
        img2 = Image.fromarray(np.roll(arr, (8, 8), axis=(0, 1)))
        net.extractors[0]['model']._rng = jax.random.PRNGKey(11)
        f1 = net.apply(params, net.extract(img1))
        net.extractors[0]['model']._rng = jax.random.PRNGKey(11)
        f2 = net.apply(params, net.extract(img2))
        src = np.array([[10.0, 12.0], [40.0, 33.0], [24.0, 44.0],
                        [50.0, 20.0], [30.0, 30.0]])
        _, pred = find_nn_source_correspondences(
            f1, f2, src, output_size=(32, 32), load_size=(64, 64))
        _, _, pck = compute_pck(np.asarray(pred), src, load_size=(64, 64))
        # frozen: full extract -> conv head -> NN-match -> PCK@0.1 pipeline
        assert pck == pytest.approx(0.8, abs=1e-6)

    def test_clip_loss_value_frozen(self):
        """The symmetric CLIP loss over cosine sims at init (task-corres.py
        compute_clip_loss) — pins the loss the trainer would start from."""
        net = AggregationNetwork(
            configs=[{'layer': {'up-level1-repeat0-res-out': True},
                      'version': 'test-sd', 'img_size': 64, 't': 50,
                      'feature_len': 32, 'dtype': 'float32'}],
            output_size=(16, 16), seed=0)
        net.extractors[0]['model']._rng = jax.random.PRNGKey(11)
        params = net.init_params(jax.random.PRNGKey(0))
        f1 = net.apply(params, net.extract(make_image(1)))
        net.extractors[0]['model']._rng = jax.random.PRNGKey(12)
        f2 = net.apply(params, net.extract(make_image(2)))
        from diffusion_feature_tpu.tasks.correspondence import (
            batch_cosine_sim)
        sims = batch_cosine_sim(f1, f2)[0] * net.logit_scale
        n = sims.shape[0]
        labels = jnp.arange(n)
        loss = 0.5 * (
            optax.softmax_cross_entropy_with_integer_labels(sims, labels)
            + optax.softmax_cross_entropy_with_integer_labels(sims.T, labels)
        ).mean()
        assert float(loss) == pytest.approx(5.411169, abs=2e-3)


class TestFrozenSegmentationMIoU:
    def test_miou_after_three_steps_frozen(self):
        from diffusion_feature_tpu.tasks.segmentation import (
            DiffusionSegmentor)
        seg = DiffusionSegmentor(
            diffusion_feature={'layer': {'up-level1-repeat0-res-out': True},
                               'version': 'test-sd', 'img_size': 64,
                               't': 50, 'dtype': 'float32'},
            feature_layers=[[('up-level1-repeat0-res-out', 32)]],
            num_classes=4, head_channels=16, pool_scales=(1, 2),
            prompt='a scene', seed=0)
        seg.extractor._rng = jax.random.PRNGKey(3)
        params, batch_stats = seg.init_state(jax.random.PRNGKey(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1)
        labels = jnp.asarray(rng.randint(0, 4, (2, 64, 64)), jnp.int32)
        key = jax.random.PRNGKey(1)
        for it in range(3):
            key, dk = jax.random.split(key)
            def lf(p, bs):
                return seg.head_loss(
                    p, bs, seg.extract_features(images, is_test=True),
                    labels, dk)
            (loss, (parts, batch_stats)), grads = jax.value_and_grad(
                lf, has_aux=True)(params, batch_stats)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        pred = seg.predict(params, batch_stats, images)
        _, miou = compute_iou(list(pred), list(np.asarray(labels)), 4,
                              ignore_label=255)
        assert float(loss) == pytest.approx(2.887347, abs=5e-3)
        assert miou == pytest.approx(0.116872, abs=2e-3)


class TestFrozenScarceMIoU:
    def test_ensemble_miou_frozen(self):
        rng = np.random.RandomState(7)
        # class-dependent feature clusters: learnable but not trivial
        y = rng.randint(0, 3, 4096)
        X = (rng.randn(4096, 8).astype(np.float32)
             + 1.5 * np.eye(3, 8, dtype=np.float32)[y])
        ensemble = train_ensemble(X, jnp.asarray(y), num_classes=3,
                                  model_num=2, max_epochs=4, batch_size=512)
        Xt = (rng.randn(1024, 8).astype(np.float32)
              + 1.5 * np.eye(3, 8, dtype=np.float32)[
                  rng.randint(0, 3, 1024)])
        yt = np.argmax(Xt[:, :3], axis=1)          # deterministic target rule
        pred, _ = predict_labels(ensemble, jnp.asarray(Xt), size=(32, 32),
                                 num_classes=3)
        _, miou = compute_iou([np.asarray(pred)], [yt.reshape(32, 32)], 3,
                              ignore_label=255)
        assert miou == pytest.approx(0.831147, abs=2e-3)
