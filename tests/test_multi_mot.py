"""Multi-stream MOT smoke test: batched detector graph + per-stream
trackers over the shared skip schedule."""
import numpy as np
import pytest
import scipy.ndimage as ndi


@pytest.mark.slow
def test_multi_stream_mot_smoke(rng):
    from fastmot_tpu.parallel.multi_mot import MultiStreamMOT

    size = (320, 256)
    n_streams = 2
    mot = MultiStreamMOT(
        size, n_streams,
        detector_frame_skip=2,
        class_ids=(0,),
        yolo_detector_cfg={'model': 'YOLOv4Tiny', 'conf_thresh': 0.25,
                           'min_aspect_ratio': 0.0},
        tracker_cfg={'max_age': 3},
    )
    mot.reset(1 / 30.0)

    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (size[1] + 8, size[0] + 8, 3)).astype(np.float32),
        1.5)

    for i in range(5):
        frames = [np.clip(base[i % 4:i % 4 + size[1],
                               i % 3:i % 3 + size[0]], 0, 255).astype(np.uint8)
                  for _ in range(n_streams)]
        mot.step(frames)

    # random weights -> usually no detections; the pipeline must still run
    # the batched graph + flow for every stream without errors
    assert mot.frame_count == 5
    for s in range(n_streams):
        list(mot.visible_tracks(s))
