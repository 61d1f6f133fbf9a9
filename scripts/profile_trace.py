#!/usr/bin/env python3
"""Parse a JAX xplane trace into per-kernel / per-op timings.

The ONLY reliable timing instrument in the tunnel-attached dev
environment (docs/PERFORMANCE.md "Environment transfer model"):
host-side timers (including ``block_until_ready`` deltas) were measured
off by 10-100x in both directions, while the on-device xplane timeline
is exact. Capture with::

    with jax.profiler.trace('/tmp/jaxtrace'):
        ... frames ...

then::

    python scripts/profile_trace.py /tmp/jaxtrace            # module totals
    python scripts/profile_trace.py /tmp/jaxtrace --ops      # op hotspots
    python scripts/profile_trace.py /tmp/jaxtrace --timeline # gap analysis

Uses the xplane proto shipped inside tensorflow (no tensorboard server
needed).
"""
import argparse
import glob
import sys
from collections import defaultdict


def load(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True))
    if not paths:
        sys.exit(f'no *.xplane.pb under {trace_dir}')
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def device_lines(xs):
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'GPU' not in plane.name:
            continue
        for line in plane.lines:
            yield plane, line


def summarize(xs, line_name, top):
    for plane, line in device_lines(xs):
        if line.name != line_name:
            continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        span_min, span_max = None, 0
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            tot[name] += ev.duration_ps
            cnt[name] += 1
            if span_min is None or ev.offset_ps < span_min:
                span_min = ev.offset_ps
            span_max = max(span_max, ev.offset_ps + ev.duration_ps)
        if not tot:
            continue
        print(f'--- {plane.name} / {line.name}: '
              f'busy {sum(tot.values()) / 1e9:.1f} ms, '
              f'span {(span_max - span_min) / 1e9:.1f} ms')
        for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f'  {ps / 1e9:9.2f} ms x{cnt[name]:<5} {name[:100]}')


def timeline(xs):
    for plane, line in device_lines(xs):
        if line.name != 'XLA Modules':
            continue
        evs = sorted(line.events, key=lambda e: e.offset_ps)
        t0 = evs[0].offset_ps
        prev_end = None
        for ev in evs:
            name = plane.event_metadata[ev.metadata_id].name.split('(')[0]
            gap = (ev.offset_ps - prev_end) / 1e9 if prev_end else 0.0
            prev_end = ev.offset_ps + ev.duration_ps
            print(f'{(ev.offset_ps - t0) / 1e9:9.2f} ms  '
                  f'+{ev.duration_ps / 1e9:7.2f}  gap {gap:7.2f}  {name}')


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('trace_dir')
    ap.add_argument('--ops', action='store_true',
                    help='per-op hotspots instead of module totals')
    ap.add_argument('--timeline', action='store_true',
                    help='chronological module timeline with idle gaps')
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()
    xs = load(args.trace_dir)
    if args.timeline:
        timeline(xs)
    else:
        summarize(xs, 'XLA Ops' if args.ops else 'XLA Modules', args.top)


if __name__ == '__main__':
    main()
