"""MultiTracker unit tests with a stubbed flow (role of the reference's
PublicDetector-style fake seams)."""
import numpy as np
import pytest

from fastmot_tpu.detector import make_detections
from fastmot_tpu.tracker import MultiTracker
from fastmot_tpu.track import Track


class StubFlow:
    """Identity camera motion, no KLT boxes."""

    def __init__(self):
        self.bg_keypoints = np.empty((0, 2), np.float32)
        self.prev_bg_keypoints = np.empty((0, 2), np.float32)

    def init(self, frame):
        pass

    def predict(self, frame, tracks):
        return {}, np.eye(3)


def make_tracker(**kw):
    trk = MultiTracker((640, 480), 'euclidean', **kw)
    trk.flow = StubFlow()
    Track._count = 0
    return trk


def dets_at(positions, conf=0.9, label=1):
    tlbrs = np.array([[x, y, x + 50, y + 120] for x, y in positions], float)
    return make_detections(tlbrs, np.full(len(positions), label, int),
                           np.full(len(positions), conf, float))


def embs(n, dim=512, seed=1):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, dim)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def test_init_and_track_continuity():
    trk = make_tracker()
    frame = np.zeros((480, 640, 3), np.uint8)
    d0 = dets_at([(100, 100), (300, 200)])
    trk.init(frame, d0)
    assert len(trk.tracks) == 2

    # simulate 3 association updates with slowly moving detections
    e = embs(2)
    for step in range(1, 4):
        d = dets_at([(100 + 5 * step, 100), (300 - 4 * step, 200)])
        trk.apply_kalman()
        trk.update(step, d, e)
        assert len(trk.tracks) == 2

    ids = sorted(trk.tracks.keys())
    assert ids == [1, 2]
    t1 = trk.tracks[1]
    # track 1 followed the moving detection
    assert abs(t1.tlbr[0] - 115) < 10


def test_unmatched_track_ages_and_dies():
    trk = make_tracker(max_age=2)
    frame = np.zeros((480, 640, 3), np.uint8)
    trk.init(frame, dets_at([(100, 100)]))
    e = embs(1)
    trk.update(1, dets_at([(100, 100)]), e)  # confirm (hits=1)
    for step in range(2, 6):
        trk.apply_kalman()
        trk.update(step, make_detections(np.zeros((0, 4)), np.zeros(0, int),
                                         np.zeros(0)), embs(0))
    assert len(trk.tracks) == 0
    assert 1 in trk.hist_tracks  # confirmed track retired to history


def test_unconfirmed_track_deleted_immediately():
    trk = make_tracker(confirm_hits=2)
    frame = np.zeros((480, 640, 3), np.uint8)
    trk.init(frame, dets_at([(100, 100)]))
    # no detections on the next update: unconfirmed track is dropped
    trk.apply_kalman()
    trk.update(1, dets_at([]), embs(0))
    assert len(trk.tracks) == 0
    assert len(trk.hist_tracks) == 0


def test_label_gate_prevents_cross_class_match():
    trk = make_tracker()
    frame = np.zeros((480, 640, 3), np.uint8)
    trk.init(frame, dets_at([(100, 100)], label=1))
    e = embs(1)
    trk.update(1, dets_at([(100, 100)], label=1), e)
    # a detection of a different class at the same spot must not match
    d = dets_at([(100, 100)], label=2)
    trk.apply_kalman()
    trk.update(2, d, embs(1, seed=3))
    labels = sorted(t.label for t in trk.tracks.values())
    assert labels == [1, 2]  # old track aged, new class-2 track started


def test_new_tracks_from_confident_unmatched():
    trk = make_tracker()
    frame = np.zeros((480, 640, 3), np.uint8)
    trk.init(frame, dets_at([(100, 100)]))
    e2 = embs(2)
    d = dets_at([(100, 100), (400, 300)])
    trk.apply_kalman()
    trk.update(1, d, e2)
    assert len(trk.tracks) == 2
    # low-confidence unmatched detections don't start tracks
    d3 = dets_at([(100, 100), (400, 300), (550, 50)])
    d3.conf[2] = 0.3
    trk.apply_kalman()
    trk.update(2, d3, embs(3))
    assert len(trk.tracks) == 2


def test_reid_after_loss():
    trk = make_tracker(max_age=1, max_reid_cost=0.9)
    frame = np.zeros((480, 640, 3), np.uint8)
    rng = np.random.default_rng(7)
    sig = rng.normal(size=512).astype(np.float32)
    sig /= np.linalg.norm(sig)
    e = sig[None, :]

    trk.init(frame, dets_at([(100, 100)]))
    # two updates with the same embedding -> avg_feat.count >= 2
    trk.update(1, dets_at([(102, 100)]), e)
    trk.apply_kalman()
    trk.update(2, dets_at([(104, 100)]), e)
    # lose the track
    empty = make_detections(np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))
    for step in (3, 4):
        trk.apply_kalman()
        trk.update(step, empty, embs(0))
    assert 1 in trk.hist_tracks

    # reappears with the same appearance elsewhere
    trk.apply_kalman()
    trk.update(5, dets_at([(200, 150)]), e)
    assert 1 in trk.tracks  # reidentified, same ID


def test_camera_motion_failure_clears_tracks():
    trk = make_tracker()
    frame = np.zeros((480, 640, 3), np.uint8)
    trk.init(frame, dets_at([(100, 100), (300, 200)]))

    class FailFlow(StubFlow):
        def predict(self, frame, tracks):
            return {}, None

    trk.flow = FailFlow()
    trk.compute_flow(frame)
    assert len(trk.tracks) == 0


def test_cluster_feature_pool():
    """Vectorized online-k-means pool (capability parity with the
    reference's ClusterFeature, track.py:11-66): warmup fill, batched
    nearest-centroid absorption with running-mean counts, min-distance
    query, and larger-side-wins merge."""
    from fastmot_tpu.track import ClusterFeature

    rng = np.random.default_rng(0)
    a = ClusterFeature(4, 'cosine')
    # two well-separated appearance modes
    m1 = np.array([1.0, 0.0, 0.0, 0.0])
    m2 = np.array([0.0, 1.0, 0.0, 0.0])
    f1 = [m1 + rng.normal(0, 0.01, 4) for _ in range(6)]
    f2 = [m2 + rng.normal(0, 0.01, 4) for _ in range(6)]
    for f in f1[:2] + f2[:2]:
        a.update(f)
    assert len(a) == 4
    a.update(np.stack(f1[2:] + f2[2:]))          # batched absorption
    assert a.cluster_sizes.sum() == 12
    # queries near each mode are close; an orthogonal one is far
    d = a.distance(np.stack([m1, m2, np.array([0, 0, 1.0, 0])]))
    assert d[0] < 0.05 and d[1] < 0.05 and d[2] > 0.5

    # merge: the side with more raw features keeps its centroids
    b = ClusterFeature(4, 'cosine')
    f3 = [np.array([0.0, 0.0, 0.0, 1.0]) + rng.normal(0, 0.01, 4)
          for _ in range(2)]
    for f in f3:
        b.update(f)
    b.merge(f3, a, f1 + f2)                      # a is larger: b adopts a
    assert b.cluster_sizes.sum() == 14
    assert b.distance(np.stack([m1]))[0] < 0.1
