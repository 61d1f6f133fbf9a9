"""Tests for the exact-parity traps called out in SURVEY.md section 7."""
import numpy as np
import pytest


def test_track_count_resets():
    """Track._count resets with tracker.reset (tracker.py:119)."""
    from fastmot_tpu.track import Track
    from tests.test_tracker import make_tracker, dets_at, embs

    trk = make_tracker()
    trk.init(np.zeros((480, 640, 3), np.uint8), dets_at([(10, 10), (200, 200)]))
    assert sorted(trk.tracks.keys()) == [1, 2]
    trk.reset(1 / 25.0)
    assert Track._count == 0
    trk.init(np.zeros((480, 640, 3), np.uint8), dets_at([(10, 10)]))
    assert sorted(trk.tracks.keys()) == [1]


def test_reset_dt_rebuilds_kf_matrices():
    """cap_dt feeds the KF transition (videoio.py:105-108 ->
    kalman_filter.py:86-94)."""
    from tests.test_tracker import make_tracker

    trk = make_tracker()
    t30 = np.asarray(trk._trans_mat).copy()
    trk.reset(1 / 10.0)
    t10 = np.asarray(trk._trans_mat)
    # velocity coupling entry scales with dt
    assert t10[0, 4] == pytest.approx(t30[0, 4] * 3.0, rel=1e-5)


def test_inclusive_size_convention():
    """+1 inclusive box size everywhere (rect.py:16-18)."""
    import jax.numpy as jnp
    from fastmot_tpu.ops import geometry as G
    b = jnp.asarray(np.array([[0.0, 0.0, 9.0, 19.0]]))
    np.testing.assert_array_equal(np.asarray(G.get_size(b)), [[10, 20]])
    np.testing.assert_array_equal(np.asarray(G.area(b)), [200])


def test_detections_sorted_by_class_public():
    """Detections emerge sorted ascending by class (detector.py:344)
    and _split_bboxes_by_cls splits correctly for multi-class configs
    (fixing the reference's bisect_right quirk)."""
    from fastmot_tpu.mot import MOT

    boxes = np.arange(24, dtype=float).reshape(6, 4)
    labels = np.array([0, 0, 1, 1, 1, 3])
    split = MOT._split_bboxes_by_cls(boxes, labels, (0, 1, 3))
    assert len(split) == 3
    np.testing.assert_array_equal(split[0], boxes[:2])
    np.testing.assert_array_equal(split[1], boxes[2:5])
    np.testing.assert_array_equal(split[2], boxes[5:])


def test_chained_sync_idempotent():
    """sync() with no pending results is a no-op; visible state stays
    consistent after repeated syncs."""
    from tests.test_tracker import make_tracker, dets_at, embs

    trk = make_tracker()
    trk.init(np.zeros((480, 640, 3), np.uint8), dets_at([(50, 50)]))
    trk.update(1, dets_at([(52, 50)]), embs(1))
    before = {tid: t.tlbr.copy() for tid, t in trk.tracks.items()}
    trk.sync()
    trk.sync()
    for tid, tlbr in before.items():
        np.testing.assert_array_equal(trk.tracks[tid].tlbr, tlbr)


def test_public_surface_parity():
    """Package exports match the reference's fastmot/__init__.py:1-7."""
    import fastmot_tpu
    for name in ('VideoIO', 'MOT', 'FeatureExtractor', 'MultiTracker',
                 'KalmanFilter', 'Flow', 'Track'):
        assert hasattr(fastmot_tpu, name), name
    kf = fastmot_tpu.KalmanFilter()
    import numpy as np
    mean, cov = kf.create(np.array([10.0, 20.0, 50.0, 90.0]))
    assert mean.shape == (8,) and cov.shape == (8, 8)
    mean, cov = kf.predict(mean, cov)
    mean, cov = kf.update(mean, cov, np.array([12.0, 21.0, 52.0, 91.0]))
    d = kf.motion_distance(mean, cov, np.zeros((3, 4), np.float32))
    assert d.shape == (3,)
