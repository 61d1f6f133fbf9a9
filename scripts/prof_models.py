#!/usr/bin/env python3
"""Profile the detector / extractor graphs per-op on the real chip.

Usage: python scripts/prof_models.py [yolo|osnet|all] [--trace DIR]
Then:  python scripts/profile_trace.py DIR --ops --top 40
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('which', nargs='?', default='all')
    ap.add_argument('--trace', default='/tmp/jaxtrace_models')
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    runs = []
    if args.which in ('yolo', 'all'):
        from fastmot_tpu.detector import YOLODetector
        det = YOLODetector((1280, 720), class_ids=(1,))
        frame = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (720, 1280, 3),
                                              dtype=np.uint8))
        jax.block_until_ready(frame)

        def run_yolo():
            det.detect_async(frame)
            jax.block_until_ready(det._pending)
            det._pending = None
        runs.append(run_yolo)

    if args.which in ('osnet', 'all'):
        from fastmot_tpu.feature_extractor import FeatureExtractor
        ext = FeatureExtractor(model='OSNet025', batch_size=16)
        frame = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (720, 1280, 3),
                                              dtype=np.uint8))
        n = 48
        tlbrs = np.stack([
            (np.arange(n) * 23) % 1100.0, (np.arange(n) * 17) % 500.0,
            (np.arange(n) * 23) % 1100.0 + 80,
            (np.arange(n) * 17) % 500.0 + 200], -1).astype(np.float32)
        valid = np.ones(n, bool)
        jax.block_until_ready(frame)

        def run_osnet():
            ext.extract_async_device(frame, jnp.asarray(tlbrs),
                                     jnp.asarray(valid))
            out = ext.postprocess_device()
            jax.block_until_ready(out)
        runs.append(run_osnet)

    for r in runs:   # compile
        r()
        r()

    with jax.profiler.trace(args.trace):
        for _ in range(args.iters):
            for r in runs:
                r()
    print('trace written to', args.trace)


if __name__ == '__main__':
    main()
