"""Flow kernel tests: pyramidal LK, RANSAC homography/similarity, and the
full Flow.predict pipeline on synthetic frames with known motion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from fastmot_tpu.ops import flow_kernels as fk


SPEC = fk.FlowSpec(size=(320, 240), opt_scale=(0.5, 0.5), bg_scale=(0.1, 0.1))


def textured(rng, h, w, pad=32):
    img = rng.uniform(0, 255, (h + 2 * pad, w + 2 * pad)).astype(np.float32)
    return ndi.gaussian_filter(img, 2.0), pad


def test_lk_translation(rng):
    base, pad = textured(rng, 240, 320)

    def crop(dx, dy):
        img = base[pad + dy:pad + dy + 240, pad + dx:pad + dx + 320]
        return np.stack([img] * 3, -1).astype(np.uint8)

    s0 = fk.preprocess(SPEC, crop(0, 0))
    s1 = fk.preprocess(SPEC, crop(5, 3))
    xs, ys = np.meshgrid(np.arange(40, 300, 40), np.arange(40, 220, 30))
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32) * 0.5
    valid = np.ones(len(pts), bool)
    cur, ok, err = jax.jit(fk.lk_pyramidal, static_argnames='spec')(
        s0[0], s0[1], s1[0], s1[1], jnp.asarray(pts), jnp.asarray(valid),
        SPEC)
    cur, ok = np.asarray(cur), np.asarray(ok)
    flow = (cur - pts) / 0.5   # back to full-res units
    assert ok.mean() > 0.8
    med = np.median(flow[ok], axis=0)
    # scene content moves by (-dx, -dy) when the crop shifts by (dx, dy)
    np.testing.assert_allclose(med, [-5, -3], atol=0.5)


def test_ransac_homography(rng):
    n = 200
    pts = rng.uniform(20, 300, (n, 2)).astype(np.float32)
    h_true = np.array([[1.02, 0.01, -4.0],
                       [-0.005, 0.99, 2.5],
                       [1e-5, -5e-6, 1.0]], np.float32)
    ones = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
    proj = ones @ h_true.T
    cur = proj[:, :2] / proj[:, 2:3]
    cur += rng.normal(0, 0.3, cur.shape)   # inlier noise
    outliers = rng.uniform(size=n) < 0.25
    cur[outliers] += rng.uniform(-80, 80, (outliers.sum(), 2))
    valid = np.ones(n, bool)

    ok, h_est, inl = jax.jit(fk.ransac_homography, static_argnames='inlier_thresh')(
        jnp.asarray(pts), jnp.asarray(cur), jnp.asarray(valid),
        jax.random.PRNGKey(0), 4)
    assert bool(ok)
    h_est = np.asarray(h_est)
    # compare action on sample points
    test_pts = np.array([[50, 50, 1], [250, 60, 1], [150, 200, 1]], float)
    for p in test_pts:
        want = h_true @ p
        want = want[:2] / want[2]
        got = h_est @ p
        got = got[:2] / got[2]
        np.testing.assert_allclose(got, want, atol=1.0)
    assert np.asarray(inl)[~outliers].mean() > 0.8


def test_ransac_similarity(rng):
    n = fk.KP_PER_TRACK
    pts = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    th = 0.05
    s = 1.04
    a, b = s * np.cos(th), s * np.sin(th)
    cur = np.stack([a * pts[:, 0] - b * pts[:, 1] + 7.0,
                    b * pts[:, 0] + a * pts[:, 1] - 3.0], -1)
    cur += rng.normal(0, 0.2, cur.shape)
    outliers = rng.uniform(size=n) < 0.2
    cur[outliers] += rng.uniform(-40, 40, (outliers.sum(), 2))
    valid = np.ones(n, bool)

    ok, aff, inl, n_m, n_i = jax.jit(
        fk.ransac_similarity, static_argnames='inlier_thresh')(
        jnp.asarray(pts), jnp.asarray(cur), jnp.asarray(valid),
        jax.random.PRNGKey(1), 4)
    assert bool(ok)
    aff = np.asarray(aff)
    np.testing.assert_allclose(aff[0, 0], a, atol=0.01)
    np.testing.assert_allclose(aff[1, 0], b, atol=0.01)
    np.testing.assert_allclose(aff[0, 2], 7.0, atol=1.0)
    np.testing.assert_allclose(aff[1, 2], -3.0, atol=1.0)


def test_flow_predict_camera_motion(rng):
    """Full Flow.predict: camera pan + a static tracked object."""
    from fastmot_tpu.flow import Flow
    from fastmot_tpu.track import Track

    base3, pad = textured(rng, 240, 320)
    base3 = np.stack([base3] * 3, -1)

    def frame(dx, dy):
        return np.clip(base3[pad + dy:pad + dy + 240,
                             pad + dx:pad + dx + 320], 0, 255).astype(np.uint8)

    flow = Flow((320, 240))
    flow.init(frame(0, 0))

    class T:
        def __init__(self, tlbr, tid):
            self.tlbr = np.array(tlbr, float)
            self.trk_id = tid
            self.keypoints = np.empty((0, 2), np.float32)
            self.prev_keypoints = np.empty((0, 2), np.float32)
            self.inlier_ratio = 1.0
            self.age = 0

        def __lt__(self, other):
            return (self.tlbr[-1], -self.age) < (other.tlbr[-1], -other.age)

    tracks = [T([60, 60, 140, 200], 1)]
    boxes, h_mat = flow.predict(frame(6, 4), tracks)
    assert h_mat is not None
    center = h_mat @ np.array([160.0, 120.0, 1.0])
    center = center[:2] / center[2]
    np.testing.assert_allclose(center, [154, 116], atol=1.5)
    assert 1 in boxes
    np.testing.assert_allclose(boxes[1][:2], [54, 56], atol=2.0)
    assert tracks[0].inlier_ratio > 0.5
    assert len(tracks[0].keypoints) >= 4
