"""End-to-end pipeline test: MOT + PublicDetector over a synthetic
MOT-Challenge-style sequence with known object motion.

This is the analog of the reference's PublicDetector-driven eval
(SURVEY.md section 4): it exercises config decoding, the detector replay,
the flow kernels, the vectorized Kalman filter, and the full association
cascade without needing pretrained networks.
"""
import numpy as np
import pytest
import scipy.ndimage as ndi

SIZE = (320, 240)          # processing size
SEQ_SIZE = (640, 480)      # "native" sequence size (det.txt coordinates)
N_FRAMES = 24


def make_sequence(tmp_path, rng):
    """3 objects moving linearly; returns (seq_dir, frames, gt)."""
    seq = tmp_path / 'SYN-01'
    (seq / 'det').mkdir(parents=True)
    (seq / 'seqinfo.ini').write_text(
        '[Sequence]\nname=SYN-01\nimWidth=640\nimHeight=480\n'
        'frameRate=30\nseqLength=24\n')

    # ground-truth tracks in native (640x480) coords: (x0, y0, vx, vy, w, h)
    objs = [(60, 80, 6, 1, 60, 140),
            (300, 60, -3, 4, 70, 160),
            (480, 200, -5, -2, 55, 130)]
    rows = []
    gt = {f: [] for f in range(N_FRAMES)}
    for f in range(N_FRAMES):
        for oid, (x, y, vx, vy, w, h) in enumerate(objs):
            cx, cy = x + vx * f, y + vy * f
            rows.append(f'{f + 1},-1,{cx:.1f},{cy:.1f},{w},{h},1,-1,-1,-1')
            gt[f].append((cx, cy, w, h))
    (seq / 'det' / 'det.txt').write_text('\n'.join(rows) + '\n')

    # textured frames at processing size with objects drawn in
    bg = ndi.gaussian_filter(
        rng.uniform(0, 255, (SIZE[1], SIZE[0], 3)).astype(np.float32), 1.5)
    frames = []
    sx = SIZE[0] / SEQ_SIZE[0]
    sy = SIZE[1] / SEQ_SIZE[1]
    for f in range(N_FRAMES):
        img = bg.copy()
        for oid, (cx, cy, w, h) in enumerate(gt[f]):
            x1, y1 = int(cx * sx), int(cy * sy)
            x2, y2 = int((cx + w) * sx), int((cy + h) * sy)
            patch = ndi.gaussian_filter(
                rng.uniform(0, 255, (max(y2 - y1, 1), max(x2 - x1, 1), 3))
                .astype(np.float32), 1.0)
            img[max(y1, 0):y2, max(x1, 0):x2] = \
                patch[:y2 - max(y1, 0), :x2 - max(x1, 0)]
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return seq, frames, gt


@pytest.mark.slow
def test_mot_public_pipeline(tmp_path, rng):
    from fastmot_tpu import MOT

    seq, frames, gt = make_sequence(tmp_path, rng)
    mot = MOT(
        SIZE,
        detector_type='PUBLIC',
        detector_frame_skip=2,
        class_ids=(1,),
        public_detector_cfg={'sequence_path': str(seq),
                             'conf_thresh': 0.5, 'max_area': 800000},
        feature_extractor_cfgs=({'model': 'OSNet025', 'batch_size': 16},),
        tracker_cfg={'max_age': 6, 'confirm_hits': 1},
    )
    mot.reset(1 / 30.0)

    ids_per_frame = []
    boxes_last = {}
    for f, frame in enumerate(frames):
        mot.step(frame.copy())
        visible = list(mot.visible_tracks())
        ids_per_frame.append({t.trk_id for t in visible})
        if f == N_FRAMES - 1:
            boxes_last = {t.trk_id: np.array(t.tlbr) for t in visible}

    # all three objects tracked at the end
    assert len(ids_per_frame[-1]) == 3
    # IDs stable over the second half of the sequence (no switches for
    # well-separated linear motion)
    for f in range(N_FRAMES // 2, N_FRAMES):
        assert ids_per_frame[f] == ids_per_frame[-1], \
            (f, ids_per_frame[f], ids_per_frame[-1])

    # final boxes close to ground truth (processing-size coords)
    sx = SIZE[0] / SEQ_SIZE[0]
    sy = SIZE[1] / SEQ_SIZE[1]
    gt_last = [np.array([cx * sx, cy * sy, (cx + w - 1) * sx, (cy + h - 1) * sy])
               for cx, cy, w, h in gt[N_FRAMES - 1]]
    for tlbr in boxes_last.values():
        dists = [np.abs(tlbr - g).max() for g in gt_last]
        assert min(dists) < 12, (tlbr, gt_last)
