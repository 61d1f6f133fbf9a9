#!/usr/bin/env python3
"""On-chip microbenchmark for the flow kernels (LK hot loop A/Bs).

Builds the same workload bench.py produces (1280x720 noise frame with
periodic sinusoidal drift, 48-track bucket x 32 keypoints + 256
background points), then times each flow core standalone:

    python scripts/prof_lk.py            # time preprocess / lk_core
    python scripts/prof_lk.py --reps 50

Host wall-clock over many back-to-back dispatches of the SAME kernel is
reliable here (unlike per-call timers): the tunnel's enqueue latency
overlaps across the batch, so (total / reps) converges to device time
for kernels >~0.5 ms (cross-checked against xplane traces r4/r5).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

SIZE = (1280, 720)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=30)
    ap.add_argument('--tracks', type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from fastmot_tpu.ops import flow_kernels as fk

    rng = np.random.default_rng(0)
    pad = 16
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (SIZE[1] + 2 * pad, SIZE[0] + 2 * pad, 3))
        .astype(np.float32), 1.5)

    def frame_at(i):
        ph = 2 * np.pi * (i % 40) / 40
        dx = int(pad / 2 + pad / 2 * np.sin(ph))
        dy = int(pad / 2 + pad / 2 * np.cos(2 * ph))
        return np.ascontiguousarray(
            np.clip(base[pad + dy:pad + dy + SIZE[1],
                         pad + dx:pad + dx + SIZE[0]], 0, 255)
        ).astype(np.uint8)

    # production values (cfg/mot.json flow_cfg)
    spec = fk.FlowSpec(size=SIZE, opt_scale=(0.5, 0.5),
                       bg_scale=(0.1, 0.1))
    t = args.tracks
    f0 = jnp.asarray(frame_at(0))
    f1 = jnp.asarray(frame_at(1))

    pre = jax.jit(lambda f: fk._preprocess_jit(spec, f))
    s0 = jax.block_until_ready(pre(f0))
    s1 = jax.block_until_ready(pre(f1))

    # bench-like track boxes
    xs = (np.arange(t) * 97) % (SIZE[0] - 120)
    ys = (np.arange(t) * 53) % (SIZE[1] - 260)
    w = 60 + (np.arange(t) * 13) % 40
    h = 160 + (np.arange(t) * 17) % 80
    tlbrs = jnp.asarray(
        np.stack([xs, ys, xs + w, ys + h], -1).astype(np.float32))
    tvalid = jnp.ones(t, bool)
    kps0 = jnp.zeros((t, fk.KP_PER_TRACK, 2), jnp.float32)
    kpv0 = jnp.zeros((t, fk.KP_PER_TRACK), bool)

    points = jax.jit(lambda st, tl, tv, k, kv: fk.flow_points_core(
        spec, st, tl, tv, k, kv))
    all_prev, all_valid, inside = jax.block_until_ready(
        points(s0, tlbrs, tvalid, kps0, kpv0))
    print(f'points: {int(np.asarray(all_valid).sum())}/'
          f'{all_valid.shape[0]} valid', file=sys.stderr)

    lk = jax.jit(lambda pp, pt, cp, ct, ap_, av: fk.lk_core(
        spec, pp, pt, cp, ct, ap_, av))
    prev_pyr, prev_tabs = s0[0], s0[1]
    cur_pyr, cur_tabs = s1[0], s1[1]
    out = jax.block_until_ready(
        lk(prev_pyr, prev_tabs, cur_pyr, cur_tabs, all_prev, all_valid))
    print(f'lk: {int(np.asarray(out[1]).sum())} tracked', file=sys.stderr)

    def clock(fn, *a, label=''):
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(*a)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f'{label:<28} {dt:7.3f} ms')
        return dt

    clock(pre, f0, label='preprocess (pyr+tables+cand)')
    clock(points, s0, tlbrs, tvalid, kps0, kpv0, label='flow_points_core')
    clock(lk, prev_pyr, prev_tabs, cur_pyr, cur_tabs, all_prev, all_valid,
          label='lk_core')


if __name__ == '__main__':
    main()
