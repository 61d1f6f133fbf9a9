"""ops.distance vs scipy.spatial.distance oracles."""
import numpy as np
from scipy.spatial.distance import cdist as sp_cdist

from fastmot_tpu.ops import distance as D


def test_euclidean(rng):
    a = rng.standard_normal((20, 512)).astype(np.float32)
    b = rng.standard_normal((30, 512)).astype(np.float32)
    got = np.asarray(D.euclidean_dist(a, b))
    want = sp_cdist(a, b, "euclidean")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cosine(rng):
    a = rng.standard_normal((20, 512)).astype(np.float32)
    b = rng.standard_normal((30, 512)).astype(np.float32)
    got = np.asarray(D.cosine_dist(a, b))
    want = sp_cdist(a, b, "cosine")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_cdist_mask(rng):
    a = rng.standard_normal((5, 16)).astype(np.float32)
    b = rng.standard_normal((7, 16)).astype(np.float32)
    mask = rng.uniform(size=(5, 7)) < 0.3
    got = np.asarray(D.cdist(a, b, D.Metric.COSINE, mask, fill_val=0.9))
    want = sp_cdist(a, b, "cosine")
    want[mask] = 0.9
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_dist(rng):
    from tests.test_geometry import np_iou_matrix, random_boxes
    a = random_boxes(rng, 12)
    b = random_boxes(rng, 9)
    got = np.asarray(D.iou_dist(a, b))
    np.testing.assert_allclose(got, 1 - np_iou_matrix(a, b), rtol=1e-5)


def test_diou_dist_range(rng):
    from tests.test_geometry import random_boxes
    a = random_boxes(rng, 12)
    got = np.asarray(D.diou_dist(a, a))
    # diagonal: identical boxes -> DIoU = 1 -> distance 0
    np.testing.assert_allclose(np.diag(got), 0.0, atol=1e-5)
    assert (got >= -1e-5).all() and (got <= 1.0 + 1e-5).all()
