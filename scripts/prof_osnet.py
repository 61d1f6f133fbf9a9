#!/usr/bin/env python3
"""On-chip A/B: Flax OSNet forward vs the fused-Pallas-block forward.

    python scripts/prof_osnet.py [--batch 64] [--reps 50]

Times module.apply (the ~70-fusion XLA lowering) against
models.osnet.apply_fused (one Pallas kernel per OSBlock) on the
production crop batch.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--reps', type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fastmot_tpu.models.osnet import (apply_fused,
                                          force_batched_streams,
                                          force_plain_streams)
    from fastmot_tpu.models.registry import ReIDModel

    model = ReIDModel.get_model('OSNet025')
    module, variables = model.init_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 128, 3))
                    .astype(np.float32))

    def plain(v, xx):
        with force_plain_streams():
            return module.apply(v, xx)

    def batched(v, xx):
        with force_batched_streams():
            return module.apply(v, xx)

    plain_fn = jax.jit(plain)
    batched_fn = jax.jit(batched)
    pallas_fn = jax.jit(lambda v, xx: apply_fused(module, v, xx))

    ref = np.asarray(jax.block_until_ready(plain_fn(variables, x)),
                     np.float32)
    for name, fn in (('batched', batched_fn), ('pallas', pallas_fn)):
        got = np.asarray(jax.block_until_ready(fn(variables, x)),
                         np.float32)
        denom = np.abs(ref).max() + 1e-6
        print(f'{name} max rel diff: '
              f'{np.abs(got - ref).max() / denom:.4f}', file=sys.stderr)

    def clock(fn, label):
        jax.block_until_ready(fn(variables, x))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(variables, x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f'{label:<28} {dt:7.3f} ms  (B={args.batch})')

    clock(plain_fn, 'plain per-stream forward')
    clock(batched_fn, 'stream-batched forward')
    clock(pallas_fn, 'fused-pallas forward')


if __name__ == '__main__':
    main()
