"""Dense/unsupervised correspondence extras: find_nn_correspondences,
points_to_patches, best-buddies, cyclical (reference
correspondence_utils.py:89-158, :230-467 — unused by the task loop but part
of the public helper surface)."""

import numpy as np
import jax.numpy as jnp

from diffusion_feature_tpu.tasks.correspondence import (
    batch_cosine_sim, chunk_cosine_sim, find_best_buddies_correspondences,
    find_cyclical_correspondences, find_nn_correspondences, points_to_patches,
)


def _descriptors(seed, t=16, d=8):
    rng = np.random.RandomState(seed)
    return rng.randn(1, 1, t, d).astype(np.float32)


class TestDenseNN:
    def test_identity_similarity_maps_to_self(self):
        rng = np.random.RandomState(0)
        f = rng.randn(1, 8, 4, 4).astype(np.float32)
        sims = batch_cosine_sim(jnp.asarray(f), jnp.asarray(f))
        p1, p2 = find_nn_correspondences(sims)
        assert p1.shape == (1, 16, 2) and p2.shape == (1, 16, 2)
        # identical features: dense NN is the identity map on the grid
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_known_permutation(self):
        # a one-hot similarity picks the argmax column -> (y, x) = divmod
        sims = np.zeros((1, 4, 4), np.float32)
        order = [2, 0, 3, 1]
        for i, j in enumerate(order):
            sims[0, i, j] = 1.0
        _, p2 = find_nn_correspondences(jnp.asarray(sims))
        want = np.array([[divmod(j, 2)] for j in order]).reshape(4, 2)
        np.testing.assert_array_equal(np.asarray(p2[0]), want)


class TestPointsToPatches:
    def test_scaling_and_clipping(self):
        pts = np.array([[0.0, 0.0], [63.0, 63.0], [31.6, 16.0]])
        patches = points_to_patches(pts, num_patches=8, load_size=(64, 64))
        # (8/64)*round(y): 0 -> 0, 63 -> 7.875 -> clip 7... round first
        np.testing.assert_array_equal(patches[0], [0, 0])
        np.testing.assert_array_equal(patches[1], [7, 7])
        np.testing.assert_array_equal(patches[2], [4, 2])


class TestBestBuddies:
    def test_identical_descriptors_all_buddies(self):
        d = _descriptors(1)
        sal = np.ones((1, 16), np.float32)
        p1, p2 = find_best_buddies_correspondences(d, d, sal, sal,
                                                   num_pairs=4)
        assert len(p1) == 4 and len(p2) == 4
        # identical descriptors: every match is its own best buddy
        np.testing.assert_array_equal(p1, p2)

    def test_background_masking_drops_pairs(self):
        d = _descriptors(2)
        sal_bg = np.zeros((1, 16), np.float32)     # everything background
        p1, p2 = find_best_buddies_correspondences(d, d, sal_bg, sal_bg)
        assert len(p1) == 0 and len(p2) == 0


class TestCyclical:
    def test_identical_descriptors_cycle_consistent(self):
        d = _descriptors(3)
        sal = np.ones((1, 16), np.float32)
        p1, p2 = find_cyclical_correspondences(d, d, sal, sal, num_pairs=4)
        assert p1.shape == (4, 2) and p2.shape == (4, 2)
        # self-matching: cycle distance 0 everywhere, matches are identity
        np.testing.assert_array_equal(p1, p2)

    def test_chunk_cosine_sim_range(self):
        a, b = _descriptors(4), _descriptors(5)
        sims = np.asarray(chunk_cosine_sim(jnp.asarray(a), jnp.asarray(b)))
        assert sims.shape == (1, 1, 16, 16)
        assert sims.max() <= 1.0 + 1e-5 and sims.min() >= -1.0 - 1e-5


class TestIPAdapterStub:
    def test_exists(self):
        from diffusion_feature_tpu.models.controlnet import IPAdapter
        assert IPAdapter is not None
