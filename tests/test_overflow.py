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


def test_flow_budget_covers_mot20_density(rng):
    """MOT20 density (BASELINE config 3: 50-80 objects/frame) fits the
    flow budget with ZERO clipping: MAX_FLOW_TRACKS == MAX_TRACKS, so
    every live track participates in KLT gap-fill (reference flow.py is
    uncapped). The per-frame budget buckets to {32,48,64,96,128} so
    typical scenes keep a right-sized LK point batch (the gather is
    row-count-bound)."""
    assert fk.MAX_FLOW_TRACKS >= MAX_TRACKS
    assert fk.flow_budget(0) == 32
    assert fk.flow_budget(40) == 48
    assert fk.flow_budget(64) == 64
    assert fk.flow_budget(65) == 96
    assert fk.flow_budget(97) == fk.MAX_FLOW_TRACKS
    # monotone and always covering
    prev = 0
    for n in range(0, MAX_TRACKS + 1):
        b = fk.flow_budget(n)
        assert b >= n and b >= prev
        prev = b

    trk = _tracker()
    frame = rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8)
    trk.init(frame, _dets(80, rng))
    assert len(trk.tracks) == 80
    # one gap frame at config-3 density: all 80 active tracks fit the
    # 128 budget (tracks may still retire behaviorally — noise frames
    # give garbage KLT boxes — but none are dropped from the flow)
    trk.track(rng.integers(0, 255, (SIZE[1], SIZE[0], 3), np.uint8))
    trk.sync()
    assert 'flow_tracks_clipped' not in trk.overflow


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
    """A history save into a full store steals the oldest entry; the
    association kernel reports it in the info head (overflow counter)."""
    import jax.numpy as jnp
    from fastmot_tpu.kalman import KalmanConfig
    from fastmot_tpu.ops.distance import Metric
    from fastmot_tpu.tracker import _assoc_kernel

    T, D, H, F = 8, 8, 4, 16
    cfg = KalmanConfig()
    tlbrs = jnp.tile(jnp.array([10.0, 10.0, 40.0, 80.0]), (T, 1))
    means = jnp.concatenate([tlbrs, jnp.zeros((T, 4))], 1)
    covs = jnp.tile(jnp.eye(8) * 4.0, (T, 1, 1))
    valid = jnp.arange(T) < 1            # one live confirmed track
    state = (means.astype(jnp.float32), covs.astype(jnp.float32),
             tlbrs.astype(jnp.float32), valid,
             jnp.full(T, 6, jnp.int32),  # age = max_age -> ages out now
             jnp.full(T, 3, jnp.int32), jnp.ones(T, jnp.int32),
             jnp.zeros(T, jnp.int32), jnp.zeros(T, jnp.int32),
             jnp.zeros(T, bool), jnp.ones(T, jnp.float32),
             jnp.zeros((T, 4, 2), jnp.float32), jnp.zeros((T, 4), bool),
             jnp.ones((T, F), jnp.float32), jnp.full(T, 3.0))
    hist = (jnp.ones((H, F), jnp.float32), jnp.full(H, 3.0),
            jnp.full(H, 7, jnp.int32), jnp.ones(H, bool),
            jnp.zeros(H, jnp.int32), jnp.full(H, 3, jnp.int32))
    # no detections: the lone track ages out and must save into the FULL
    # history store -> one steal
    dets = (jnp.zeros((D, 4), jnp.float32), jnp.full(D, -1, jnp.int32),
            jnp.zeros(D, jnp.float32), jnp.zeros(D, bool),
            jnp.zeros((D, F), jnp.float32))
    _, _, info = _assoc_kernel(
        cfg, Metric.EUCLIDEAN, 4, 0.2, 0.9, 0.6, 1.0, 0.7, 0.5, 0.45, 0.2,
        1, 6, H, state, hist, *dets, jnp.int32(10),
        jnp.array([0.0, 0.0, 639.0, 479.0]))
    stolen = int(np.asarray(info)[2])
    assert stolen == 1


def test_overflow_warns_once(rng, caplog):
    import logging
    trk = _tracker()
    with caplog.at_level(logging.WARNING, logger='fastmot_tpu.tracker'):
        trk.overflow.bump('detections_clipped', 3)
        trk.overflow.bump('detections_clipped', 4)
    warns = [r for r in caplog.records if 'Capacity overflow' in r.message]
    assert len(warns) == 1
    assert trk.overflow['detections_clipped'] == 7
