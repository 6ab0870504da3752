"""Downstream task tests: correspondence aggregation + loss/PCK, scarce
pixel-classifier ensemble."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from PIL import Image

from diffusion_feature_tpu.tasks.correspondence import (
    AggregationNetwork, batch_cosine_sim, compute_pck,
    find_nn_source_correspondences, points_to_idxs, rescale_points,
)
from diffusion_feature_tpu.tasks.scarce import (
    compute_iou, predict_labels, shuffle_split, train_ensemble,
)


def make_image(seed=0, size=80):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype('uint8'))


class TestCorrespondenceUtils:
    def test_points_to_idxs(self):
        pts = np.array([[2.0, 3.0], [0.0, 0.0]])     # (y, x)
        idx = points_to_idxs(pts, (8, 8))
        assert list(idx) == [19.0, 0.0]              # 8*2+3, 0

    def test_rescale_points(self):
        pts = np.array([[10.0, 20.0]])
        out = rescale_points(pts, (100, 50), (200, 100))   # (w,h) doubled
        assert np.allclose(out, [[20.0, 40.0]])

    def test_pck_identity(self):
        pts = np.random.RandomState(0).rand(5, 2) * 100
        _, pck, rate = compute_pck(pts, pts, (128, 128))
        assert rate == 1.0
        _, _, rate2 = compute_pck(pts, pts + 100.0, (128, 128))
        assert rate2 == 0.0

    def test_pck_bbox_relative(self):
        pred = np.array([[0.0, 0.0]])
        tgt = np.array([[0.0, 9.0]])
        # bbox side 50 -> threshold 5 -> miss; side 200 -> threshold 20 -> hit
        _, miss, _ = compute_pck(pred, tgt, (512, 512),
                                 target_bounding_box=(0, 0, 50, 50))
        _, hit, _ = compute_pck(pred, tgt, (512, 512),
                                target_bounding_box=(0, 0, 200, 200))
        assert not miss[0] and hit[0]

    def test_nn_correspondence_recovers_identity(self):
        # identical feature maps -> each source point maps to itself
        f = jnp.asarray(np.random.RandomState(0).rand(1, 8, 16, 16),
                        jnp.float32)
        sp = np.array([[100.0, 200.0], [50.0, 300.0]])   # (y,x) in 512-space
        _, pred = find_nn_source_correspondences(f, f, sp, (16, 16),
                                                 (512, 512))
        pred = np.asarray(pred, np.float64)
        assert np.abs(pred - np.round(sp)).max() <= 1.0


class TestAggregationNetwork:
    @pytest.fixture(scope='class')
    def net(self):
        cfg = [{'feature_len': 32, 'layer': {'up-level1-repeat0-res-out': True},
                'version': 'test-sd', 'attention': None, 'img_size': 64,
                't': 50, 'dtype': 'float32'}]
        return AggregationNetwork(cfg, output_size=(32, 32))

    def test_extract_shape(self, net):
        f = net.extract(make_image(0))
        assert f.shape == (1, 32, 32, 32)

    def test_single_config_conv_keeps_dim(self, net):
        # algorithm='conv' (default): dim -> dim learned conv for one
        # extractor (reference :20-22)
        params = net.init_params()
        f = net.extract(make_image(0))
        out = net.apply(params, f)
        assert out.shape == f.shape and out is not f

    def test_algorithm_nn_skips_conv(self):
        cfg = [{'feature_len': 32, 'layer': {'up-level1-repeat0-res-out': True},
                'version': 'test-sd', 'attention': None, 'img_size': 64,
                't': 50, 'dtype': 'float32'}]
        net = AggregationNetwork(cfg, output_size=(32, 32), algorithm='nn')
        f = net.extract(make_image(0))
        assert net.apply(net.init_params(), f) is f

    def test_clip_loss_trains(self, net):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from task_corres import clip_loss
        params = net.init_params()
        f1 = net.extract(make_image(1))
        f2 = net.extract(make_image(2))
        si = jnp.asarray([5, 100, 731], jnp.int32)
        ti = jnp.asarray([6, 101, 600], jnp.int32)
        loss, grads = jax.value_and_grad(clip_loss)(params, net, f1, f2, si, ti)
        assert np.isfinite(float(loss))
        # the aggregation conv receives gradient (the reference's only
        # trainable module; logit_scale stays fixed)
        assert float(jnp.abs(grads['out_kernel']).sum()) > 0


class TestMultiExtractorConv:
    def test_dual_config_conv_halves_channels(self):
        cfg = [{'feature_len': 32, 'layer': {'up-level1-repeat0-res-out': True},
                'version': 'test-sd', 'attention': None, 'img_size': 64,
                't': 50, 'dtype': 'float32'},
               {'feature_len': 64, 'layer': {'mid-vit-block0-self-q': True},
                'version': 'test-sd', 'attention': None, 'img_size': 64,
                't': 100, 'dtype': 'float32'}]
        net = AggregationNetwork(cfg, output_size=(16, 16))
        f = net.extract(make_image(0))
        assert f.shape == (1, 96, 16, 16)
        out = net.apply(net.init_params(), f)
        assert out.shape == (1, 48, 16, 16)


class TestScarce:
    def test_ensemble_learns_separable_classes(self):
        rng = np.random.RandomState(0)
        n, d = 512, 8
        y = rng.randint(0, 3, n)
        X = rng.randn(n, d).astype(np.float32) * 0.1
        X[:, :3] += np.eye(3, dtype=np.float32)[y] * 3.0
        ensemble = train_ensemble(X, y, num_classes=3, model_num=2,
                                  max_epochs=12, batch_size=64)
        pred, unc = predict_labels(ensemble, jnp.asarray(X), (n,), 3)
        acc = (pred.ravel() == y).mean()
        assert acc > 0.9
        assert np.isfinite(unc)

    def test_compute_iou(self):
        p = [np.array([[0, 1], [1, 2]])]
        g = [np.array([[0, 1], [2, 2]])]
        ious, miou = compute_iou(p, g, 3)
        # inter/(1e-8+union) epsilon semantics (reference)
        assert abs(ious[0] - 1.0) < 1e-6
        assert abs(ious[1] - 0.5) < 1e-6 and abs(ious[2] - 0.5) < 1e-6
        assert abs(miou - 2 / 3) < 1e-6

    def test_compute_iou_ignore_label(self):
        p = [np.array([0, 1, 2])]
        g = [np.array([0, 255, 2])]
        ious, miou = compute_iou(p, g, 3, ignore_label=255)
        # class 1 never appears after masking -> IoU 0, averaged over ALL
        # classes (reference semantics)
        assert abs(miou - 2 / 3) < 1e-6

    def test_shuffle_split(self):
        imgs = [f'i{k}' for k in range(10)]
        labs = [f'l{k}' for k in range(10)]
        ti, tl, vi, vl = shuffle_split(imgs, labs, 7, seed=1)
        assert len(ti) == 7 and len(vi) == 3
        assert {i[1:] for i in ti} == {l[1:] for l in tl}  # pairs kept aligned


class TestDrawCorrespondences:
    def test_writes_side_by_side_image(self, tmp_path):
        from diffusion_feature_tpu.tasks.correspondence import draw_correspondences
        img1 = make_image(0, 64)
        img2 = make_image(1, 64)
        pts = np.array([[10.0, 20.0], [30.0, 40.0]])
        out = draw_correspondences(pts, pts + 3, img1, img2,
                                   str(tmp_path / 'c.png'), title='pck 1.0')
        im = Image.open(out)
        assert im.size == (128, 80)
