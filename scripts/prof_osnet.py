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
    from fastmot_tpu.models.osnet import apply_fused
    from fastmot_tpu.models.registry import ReIDModel

    model = ReIDModel.get_model('OSNet025')
    module, variables = model.init_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 128, 3))
                    .astype(np.float32))

    flax_fn = jax.jit(module.apply)
    fused_fn = jax.jit(lambda v, xx: apply_fused(module, v, xx))

    ref = np.asarray(jax.block_until_ready(flax_fn(variables, x)),
                     np.float32)
    got = np.asarray(jax.block_until_ready(fused_fn(variables, x)),
                     np.float32)
    denom = np.abs(ref).max() + 1e-6
    print(f'max rel diff: {np.abs(got - ref).max() / denom:.4f}',
          file=sys.stderr)

    def clock(fn, label):
        jax.block_until_ready(fn(variables, x))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(variables, x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f'{label:<24} {dt:7.3f} ms  (B={args.batch})')

    clock(flax_fn, 'flax OSNet forward')
    clock(fused_fn, 'fused-pallas forward')


if __name__ == '__main__':
    main()
