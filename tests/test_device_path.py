"""End-to-end test of the all-device detection frame path (YOLO detector
output consumed by update_device with injected synthetic detections)."""
import numpy as np
import pytest
import scipy.ndimage as ndi


@pytest.mark.slow
def test_mot_device_path(rng):
    import jax.numpy as jnp
    from fastmot_tpu import MOT
    from fastmot_tpu.detector import MAX_DETS, make_detections

    size = (320, 256)
    mot = MOT(size,
              detector_type='YOLO',
              detector_frame_skip=2,
              class_ids=(0,),
              yolo_detector_cfg={'model': 'YOLOv4Tiny', 'conf_thresh': 0.25,
                                 'min_aspect_ratio': 0.0},
              feature_extractor_cfgs=({'model': 'OSNet025'},),
              tracker_cfg={'max_age': 3})

    # inject deterministic synthetic detections as device arrays
    real_post_dev = mot.detector.postprocess_device
    real_post = mot.detector.postprocess
    cur = {'i': 0}

    def synth(i):
        x = 40.0 + 5 * i
        tlbrs = np.zeros((MAX_DETS, 4), np.float32)
        labels = np.full(MAX_DETS, -1, np.int32)
        confs = np.zeros(MAX_DETS, np.float32)
        valid = np.zeros(MAX_DETS, bool)
        tlbrs[0] = [x, 50, x + 40, 150]
        tlbrs[1] = [200, 100 + 4 * i, 250, 220 + 4 * i]
        labels[:2] = 0
        confs[:2] = 0.9
        valid[:2] = True
        return tlbrs, labels, confs, valid

    def patched_dev():
        real_post_dev()
        return tuple(jnp.asarray(a) for a in synth(cur['i']))

    def patched_host():
        real_post()
        tlbrs, labels, confs, valid = synth(cur['i'])
        return make_detections(tlbrs[valid].astype(float),
                               labels[valid].astype(int),
                               confs[valid].astype(float))

    mot.detector.postprocess_device = patched_dev
    mot.detector.postprocess = patched_host
    mot.reset(1 / 30.0)

    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (size[1], size[0], 3)).astype(np.float32), 1.5)
    frame = np.clip(base, 0, 255).astype(np.uint8)

    for i in range(6):
        cur['i'] = i
        mot.step(frame.copy())

    visible = list(mot.visible_tracks())
    assert len(visible) == 2
    ids = sorted(t.trk_id for t in visible)
    assert ids == [1, 2]
    # tracks followed the moving synthetic detections
    by_id = {t.trk_id: t.tlbr for t in visible}
    assert abs(by_id[1][0] - (40 + 5 * 4)) < 15   # last detection frame i=4
    assert abs(by_id[2][1] - (100 + 4 * 4)) < 15


@pytest.mark.slow
def test_assoc_frame_fusion_matches_split(rng, monkeypatch):
    """The one-kernel association frame (_assoc_frame_core: extract +
    costs + stage scan + finals + commit) must produce bit-identical
    track state to the split extract-then-scan path it replaces
    (FASTMOT_SPLIT_ASSOC=1)."""
    import jax.numpy as jnp
    from fastmot_tpu import MOT
    from fastmot_tpu.detector import MAX_DETS

    size = (320, 256)
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (size[1], size[0], 3)).astype(np.float32), 1.5)
    frame = np.clip(base, 0, 255).astype(np.uint8)

    def synth(i):
        x = 40.0 + 5 * i
        tlbrs = np.zeros((MAX_DETS, 4), np.float32)
        labels = np.full(MAX_DETS, -1, np.int32)
        confs = np.zeros(MAX_DETS, np.float32)
        valid = np.zeros(MAX_DETS, bool)
        tlbrs[0] = [x, 50, x + 40, 150]
        tlbrs[1] = [200, 100 + 4 * i, 250, 220 + 4 * i]
        tlbrs[2] = [60 + 3 * i, 60, 130 + 3 * i, 200]   # overlaps #1
        labels[:3] = 0
        confs[:3] = [0.9, 0.9, 0.6]
        valid[:3] = True
        return tlbrs, labels, confs, valid

    def run(split):
        if split:
            monkeypatch.setenv('FASTMOT_SPLIT_ASSOC', '1')
        else:
            monkeypatch.delenv('FASTMOT_SPLIT_ASSOC', raising=False)
        mot = MOT(size,
                  detector_type='YOLO',
                  detector_frame_skip=2,
                  class_ids=(0,),
                  yolo_detector_cfg={'model': 'YOLOv4Tiny',
                                     'conf_thresh': 0.25,
                                     'min_aspect_ratio': 0.0},
                  feature_extractor_cfgs=({'model': 'OSNet025'},),
                  tracker_cfg={'max_age': 3})
        real_post_dev = mot.detector.postprocess_device
        cur = {'i': 0}

        def patched_dev():
            real_post_dev()
            return tuple(jnp.asarray(a) for a in synth(cur['i']))

        mot.detector.postprocess_device = patched_dev
        mot.reset(1 / 30.0)
        for i in range(6):
            cur['i'] = i
            mot.step(frame.copy())
        return sorted((t.trk_id, tuple(np.asarray(t.tlbr)))
                      for t in mot.visible_tracks())

    ref = run(split=True)
    got = run(split=False)
    assert ref == got
    assert len(ref) >= 2
