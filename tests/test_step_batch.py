"""Offline/file-mode batched stepping: MOT.step_batch and
MultiTracker.track_chain must be semantically identical to per-frame
stepping — same track IDs, same boxes, same txt snapshots — while using
two device dispatches per run of gap frames instead of two per frame
(the chained lax.scan path, tracker._gap_chain_core)."""
import numpy as np
import pytest

from .test_e2e import SIZE, N_FRAMES, make_sequence


def _run(mot, frames, batched: bool):
    mot.reset(1 / 30.0)
    if batched:
        mot.step_batch([f.copy() for f in frames])
    else:
        for frame in frames:
            mot.step(frame.copy())
    snaps = mot.flush_tracks()
    return {fid: sorted((tid, tuple(np.round(tlbr, 4)))
                        for tid, tlbr in rows)
            for fid, rows in snaps.items()}


def _make_mot(seq, skip=3):
    from fastmot_tpu import MOT
    return MOT(
        SIZE,
        detector_type='PUBLIC',
        detector_frame_skip=skip,
        class_ids=(1,),
        public_detector_cfg={'sequence_path': str(seq),
                             'conf_thresh': 0.5, 'max_area': 800000},
        feature_extractor_cfgs=({'model': 'OSNet025', 'batch_size': 16},),
        tracker_cfg={'max_age': 6, 'confirm_hits': 1},
    )


def test_step_batch_smoke(tmp_path, rng):
    """Fast-tier coverage of the default file-source CLI path
    (app.py routes file inputs through step_batch): a SHORT sequence,
    chained vs per-frame replay equality on the all-device path. The
    multi-seed / cycle-boundary torture variants stay in the slow tier
    below."""
    seq, frames, _ = make_sequence(tmp_path, rng)
    frames = frames[:11]          # 3 full skip cycles + partial tail

    ref = _run(_make_mot(seq), frames, batched=False)
    got = _run(_make_mot(seq), frames, batched=True)

    assert set(ref) == set(got)
    for fid in ref:
        assert ref[fid] == got[fid], (fid, ref[fid], got[fid])
    assert any(rows for rows in ref.values())


@pytest.mark.slow
def test_step_batch_matches_per_frame(tmp_path, rng):
    seq, frames, _ = make_sequence(tmp_path, rng)

    ref = _run(_make_mot(seq), frames, batched=False)
    got = _run(_make_mot(seq), frames, batched=True)

    assert set(ref) == set(got)
    for fid in ref:
        assert ref[fid] == got[fid], (fid, ref[fid], got[fid])
    # the sequence must actually have tracked something, or the
    # equivalence is vacuous
    assert any(rows for rows in ref.values())


@pytest.mark.slow
def test_step_batch_partial_cycles(tmp_path, rng):
    """Batch boundaries that do NOT align with the skip cycle (and a
    trailing partial cycle) must still replay identically."""
    seq, frames, _ = make_sequence(tmp_path, rng)

    ref = _run(_make_mot(seq, skip=4), frames, batched=False)

    mot = _make_mot(seq, skip=4)
    mot.reset(1 / 30.0)
    # odd chunk sizes: cycles split across batch calls
    chunks = [frames[0:5], frames[5:6], frames[6:13], frames[13:N_FRAMES]]
    for chunk in chunks:
        mot.step_batch([f.copy() for f in chunk])
    snaps = mot.flush_tracks()
    got = {fid: sorted((tid, tuple(np.round(tlbr, 4)))
                       for tid, tlbr in rows)
           for fid, rows in snaps.items()}

    assert set(ref) == set(got)
    for fid in ref:
        assert ref[fid] == got[fid], (fid, ref[fid], got[fid])
