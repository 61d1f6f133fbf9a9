#!/usr/bin/env python3
"""Microbenchmark the association-stage auction on production-shaped
inputs (the bench workload's stage-1 regime: ~64 live track rows, ~40
valid detections, near-tie appearance costs from random-weight
embeddings). Traces per-variant kernel time so the while-loop round
count — the auction's real cost — is visible.

Usage: python scripts/prof_auction.py [--trace DIR]
Then:  python scripts/profile_trace.py DIR
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage1_cost(t_live=64, d_live=40, cap=128, seed=0):
    """Fused appearance+motion cost like the bench's depth-0 stage:
    appearance nearly constant (random-weight OSNet gives near-identical
    embeddings), motion = scaled Mahalanobis with geometric structure,
    gated at max_assoc_cost then filled with INF elsewhere."""
    rng = np.random.default_rng(seed)
    # track/detection positions on a 1280x720 field, tracks near dets
    dx = rng.uniform(0, 1280, d_live)
    dy = rng.uniform(0, 720, d_live)
    tx = np.concatenate([dx + rng.normal(0, 12, d_live),
                         rng.uniform(0, 1280, t_live - d_live)])
    ty = np.concatenate([dy + rng.normal(0, 12, d_live),
                         rng.uniform(0, 720, t_live - d_live)])
    d2 = ((tx[:, None] - dx[None, :]) ** 2
          + (ty[:, None] - dy[None, :]) ** 2) / (40.0 ** 2)
    maha_norm = np.clip(d2, 0, 12.0) / 9.4877
    app = 0.35 + rng.normal(0, 2e-3, (t_live, d_live))   # near-tie
    fused = 0.8 * app + 0.2 * maha_norm
    gated = np.where(maha_norm > 1.0, 1e5, fused)
    gated = np.where(gated > 0.9, 1e5, gated)
    cost = np.full((cap, cap), 1e5, np.float32)
    cost[:t_live, :d_live] = gated
    row_valid = np.zeros(cap, bool)
    row_valid[:t_live] = True
    col_valid = np.zeros(cap, bool)
    col_valid[:d_live] = True
    return cost, row_valid, col_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace', default='/tmp/jaxtrace_auction')
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fastmot_tpu.ops import assignment as asg
    import scipy.optimize as so

    cases = [stage1_cost(seed=s) for s in range(4)]
    dev_cases = [(jnp.asarray(c), jnp.asarray(rv), jnp.asarray(cv))
                 for c, rv, cv in cases]

    def run(eps):
        outs = []
        for c, rv, cv in dev_cases:
            outs.append(asg.auction_lap(c, rv, cv, eps_final=eps))
        jax.block_until_ready(outs)
        return outs

    # correctness vs scipy on the masked matrix
    for (c, rv, cv), (cd, rvd, cvd) in zip(cases, dev_cases):
        _, c4r = asg.auction_lap(cd, rvd, cvd, eps_final=1e-2)
        c4r = np.asarray(c4r)
        sub = np.minimum(c, 4.5)
        ri, ci = so.linear_sum_assignment(sub)
        ref_pairs = {(i, j) for i, j in zip(ri, ci) if c[i, j] < 1e5}
        got_pairs = {(i, int(j)) for i, j in enumerate(c4r) if j >= 0}
        ref_tot = sum(c[i, j] for i, j in ref_pairs)
        got_tot = sum(c[i, j] for i, j in got_pairs)
        print(f'pairs ref={len(ref_pairs)} got={len(got_pairs)} '
              f'total ref={ref_tot:.4f} got={got_tot:.4f} '
              f'delta={got_tot - ref_tot:.5f}')

    run(1e-2)  # compile
    with jax.profiler.trace(args.trace):
        for _ in range(args.iters):
            run(1e-2)
    print('trace written to', args.trace)


if __name__ == '__main__':
    main()
