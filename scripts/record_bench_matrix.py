#!/usr/bin/env python3
"""Assemble docs/bench_configs_r05.json from a bench sweep log.

The sweep is `make bench-all` plus the live-mode and int8 rows::

    for a in "--config 2" "--config 1" "--config 3" "--config 4" \
             "--config 5" "--no-chain" "--int8"; do
        echo "=== bench $a ===" >> sweep.log
        python bench.py $a >> sweep.log
    done
    python scripts/record_bench_matrix.py sweep.log

Each bench.py invocation prints ONE JSON line; this script collects
them, tags each with the flag it ran under, and writes the matrix with
the git commit + timestamp so the recorded numbers are tied to code.
"""
import json
import subprocess
import sys
import time


def main(log_path, out_path='docs/bench_configs_r05.json'):
    rows = []
    flag = None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('=== bench '):
                flag = line[len('=== bench '):].rstrip(' =')
            elif line.startswith('{'):
                row = json.loads(line)
                row['bench_args'] = flag
                rows.append(row)
    if not rows:
        sys.exit(f'no bench JSON lines found in {log_path}')
    commit = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                            capture_output=True, text=True).stdout.strip()
    doc = {
        'generated': time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime()),
        'commit': commit,
        'hardware': 'TPU v5e (1 chip) behind the axon dev tunnel; '
                    'medians of 3 passes (tunnel enqueue latency '
                    'fluctuates ~2x minute to minute and session to '
                    'session — compare rows within one sweep, and see '
                    'docs/PERFORMANCE.md "Environment transfer model")',
        'rows': rows,
    }
    with open(out_path, 'w') as f:
        json.dump(doc, f, indent=1)
        f.write('\n')
    print(f'wrote {out_path}: {len(rows)} rows @ {commit}')
    for r in rows:
        print(f"  {r['metric']:<46} {r['value']:>8} {r['unit']}"
              f"  (vs_baseline {r['vs_baseline']})")


if __name__ == '__main__':
    main(*sys.argv[1:])
