"""Deliberate capacity overflows must be counted and warned, not silent
(SURVEY.md §7 'assert-and-clip with overflow counters')."""
import numpy as np
import pytest

from fastmot_tpu.detector import make_detections
from fastmot_tpu.tracker import MAX_DETS, MAX_TRACKS, MultiTracker
from fastmot_tpu.ops import flow_kernels as fk

SIZE = (160, 120)


def _dets(n, rng, wh=(10, 14)):
    tl = rng.uniform([0, 0], [SIZE[0] - wh[0] - 1, SIZE[1] - wh[1] - 1],
                     (n, 2))
    tlbrs = np.concatenate([tl, tl + wh], axis=1)
    return make_detections(tlbrs, np.ones(n, int), np.full(n, 0.9))


def _tracker():
    # small frames need a shallower LK pyramid (maxLevel 2)
    return MultiTracker(SIZE, 'euclidean', confirm_hits=1,
                        flow_cfg={'opt_flow_params': {
                            'winSize': (5, 5), 'maxLevel': 2,
                            'criteria': (3, 10, 0.03)}})


def test_detections_clipped(rng):
    trk = _tracker()
    frame = rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8)
    trk.init(frame, _dets(MAX_DETS + 25, rng))
    assert trk.overflow['detections_clipped'] == 25


def test_flow_tracks_clipped(rng):
    trk = _tracker()
    frame = rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8)
    n = fk.MAX_FLOW_TRACKS + 10
    trk.init(frame, _dets(n, rng))
    trk.track(rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8))
    assert trk.overflow['flow_tracks_clipped'] == 10


def test_keypoints_clipped(rng):
    trk = _tracker()
    frame = rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8)
    trk.init(frame, _dets(3, rng))
    tid = next(iter(trk.tracks))
    trk.tracks[tid].keypoints = np.zeros((fk.KP_PER_TRACK + 7, 2),
                                         np.float32)
    trk._mirrors_dirty = True
    trk._upload_state()
    assert trk.overflow['keypoints_clipped'] == 7


def test_tracks_clipped_on_upload(rng):
    trk = _tracker()
    frame = rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8)
    trk.init(frame, _dets(5, rng))
    from fastmot_tpu.track import Track
    state = (np.zeros(8, np.float32), np.eye(8, dtype=np.float32))
    for _ in range(MAX_TRACKS):
        t = Track(0, np.array([1.0, 1.0, 9.0, 9.0]), state, 1, 1)
        trk.tracks[t.trk_id] = t
    trk._mirrors_dirty = True
    trk._upload_state()
    assert trk.overflow['tracks_clipped'] == 5


def test_hist_slot_steal_counted(rng):
    trk = _tracker()
    trk._hist_slot = {i: i for i in range(trk._hist_cap)}
    trk._alloc_hist_slot(10_000)
    assert trk.overflow['hist_slots_stolen'] == 1


def test_overflow_warns_once(rng, caplog):
    import logging
    trk = _tracker()
    with caplog.at_level(logging.WARNING, logger='fastmot_tpu.tracker'):
        trk.overflow.bump('detections_clipped', 3)
        trk.overflow.bump('detections_clipped', 4)
    warns = [r for r in caplog.records if 'Capacity overflow' in r.message]
    assert len(warns) == 1
    assert trk.overflow['detections_clipped'] == 7
