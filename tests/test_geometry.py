"""Unit tests for ops.geometry against independent numpy oracles.

The oracles re-implement the documented semantics of the reference's
fastmot/utils/rect.py (inclusive +1 size convention, greedy NMS order).
"""
import numpy as np
import pytest

from fastmot_tpu.ops import geometry as G


def np_area(b):
    w = b[..., 2] - b[..., 0] + 1
    h = b[..., 3] - b[..., 1] + 1
    return np.where((w > 0) & (h > 0), w * h, 0.0)


def np_iou_matrix(a, b):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = br - tl + 1
    inter = np.where((wh > 0).all(-1), wh[..., 0] * wh[..., 1], 0.0)
    union = np_area(a)[:, None] + np_area(b)[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(inter > 0, inter / union, 0.0)
    return out


def random_boxes(rng, n, img=(1280, 720)):
    x1 = rng.uniform(0, img[0] - 40, n)
    y1 = rng.uniform(0, img[1] - 40, n)
    w = rng.uniform(10, 200, n)
    h = rng.uniform(10, 300, n)
    return np.round(np.stack([x1, y1, x1 + w, y1 + h], -1)).astype(np.float32)


def test_size_area_center(rng):
    b = random_boxes(rng, 32)
    np.testing.assert_allclose(np.asarray(G.get_size(b)),
                               np.stack([b[:, 2] - b[:, 0] + 1,
                                         b[:, 3] - b[:, 1] + 1], -1))
    np.testing.assert_allclose(np.asarray(G.area(b)), np_area(b))
    np.testing.assert_allclose(np.asarray(G.get_center(b)),
                               (b[:, :2] + b[:, 2:]) / 2)


def test_tlwh_roundtrip(rng):
    b = random_boxes(rng, 16)
    tlwh = np.asarray(G.to_tlwh(b))
    back = np.asarray(G.to_tlbr(tlwh))
    np.testing.assert_allclose(back, b)


def test_round_half_even():
    # Python round() is half-to-even; jnp.round must match.
    vals = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 3.5], dtype=np.float32)
    got = np.asarray(G.as_tlbr(vals))
    want = np.array([round(float(v)) for v in vals], dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_ios_iom(rng):
    a = random_boxes(rng, 64)
    b = random_boxes(rng, 64)
    tl = np.maximum(a[:, :2], b[:, :2])
    br = np.minimum(a[:, 2:], b[:, 2:])
    wh = br - tl + 1
    inter = np.where((wh > 0).all(-1), wh[:, 0] * wh[:, 1], 0.0)
    np.testing.assert_allclose(np.asarray(G.ios(a, b)), inter / np_area(a),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(G.iom(a, b)),
                               inter / np.minimum(np_area(a), np_area(b)),
                               rtol=1e-5)


def test_bbox_ious(rng):
    a = random_boxes(rng, 40)
    b = random_boxes(rng, 25)
    np.testing.assert_allclose(np.asarray(G.bbox_ious(a, b)),
                               np_iou_matrix(a, b), rtol=1e-5)


def test_find_occluded(rng):
    b = random_boxes(rng, 50)
    ios_mat = np_iou_matrix(b, b) * 0  # placeholder, build ios directly
    tl = np.maximum(b[:, None, :2], b[None, :, :2])
    br = np.minimum(b[:, None, 2:], b[None, :, 2:])
    wh = br - tl + 1
    inter = np.where((wh > 0).all(-1), wh[..., 0] * wh[..., 1], 0.0)
    ios_mat = inter / np_area(b)[:, None]
    np.fill_diagonal(ios_mat, 0)
    want = (ios_mat >= 0.7).any(1)
    got = np.asarray(G.find_occluded(b, 0.7))
    np.testing.assert_array_equal(got, want)


def test_find_occluded_masked(rng):
    b = random_boxes(rng, 8)
    # duplicate box 0 into padding slot; invalid padding must not occlude
    b[7] = b[0]
    valid = np.ones(8, bool)
    valid[7] = False
    got = np.asarray(G.find_occluded(b, 0.7, valid))
    assert not got[7]
    # box 0 must not be flagged merely because of the invalid duplicate
    b2 = b.copy()
    b2[7] = [-1e4, -1e4, -1e4 + 1, -1e4 + 1]
    want = np.asarray(G.find_occluded(b2[:7], 0.7))
    np.testing.assert_array_equal(got[:7], want)


def np_greedy_nms(tlbrs, scores, thresh, diou=False, beta=0.6):
    """Oracle: greedy suppression in score order (rect.py:160-244)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(scores), bool)
    removed = np.zeros(len(scores), bool)
    for i in order:
        if removed[i]:
            continue
        keep[i] = True
        for j in order:
            if j == i or removed[j] or keep[j]:
                continue
            iou = np_iou_matrix(tlbrs[i:i + 1], tlbrs[j:j + 1])[0, 0]
            metric = iou
            if diou:
                ci = (tlbrs[i, :2] + tlbrs[i, 2:]) / 2
                cj = (tlbrs[j, :2] + tlbrs[j, 2:]) / 2
                d = ((ci - cj) ** 2).sum()
                ew = max(tlbrs[i, 2], tlbrs[j, 2]) - min(tlbrs[i, 0], tlbrs[j, 0]) + 1
                eh = max(tlbrs[i, 3], tlbrs[j, 3]) - min(tlbrs[i, 1], tlbrs[j, 1]) + 1
                c = ew ** 2 + eh ** 2
                metric = iou - (d / c) ** beta
            if metric > thresh:
                removed[j] = True
    return keep


@pytest.mark.parametrize("diou", [False, True])
def test_nms(rng, diou):
    n = 60
    b = random_boxes(rng, n)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[50:] = False
    if diou:
        got = np.asarray(G.diou_nms_mask(b, scores, valid, 0.5))
    else:
        got = np.asarray(G.nms_mask(b, scores, valid, 0.5))
    want = np_greedy_nms(b[:50], scores[:50], 0.5, diou=diou)
    np.testing.assert_array_equal(got[:50], want)
    assert not got[50:].any()


def test_nms_wave_equals_sequential_dense(rng):
    """The wave-parallel suppression must match the sequential greedy
    scan exactly on dense, chain-heavy layouts (many mutual overlaps,
    duplicate scores exercising the first-index tie-break)."""
    for trial in range(5):
        n = 200
        b = random_boxes(rng, n, img=(400, 300))   # heavy overlap
        scores = np.round(rng.uniform(0.1, 1.0, n), 2).astype(np.float32)
        valid = rng.uniform(size=n) < 0.9
        got = np.asarray(G.nms_mask(b, scores, valid, 0.3))
        want_sub = np_greedy_nms(b[valid], scores[valid], 0.3, diou=False)
        want = np.zeros(n, bool)
        want[np.flatnonzero(valid)] = want_sub
        np.testing.assert_array_equal(got, want, err_msg=str(trial))
