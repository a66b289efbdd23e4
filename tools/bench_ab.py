"""Run bench.py's measurement for several knob configs in ONE process.

Saves the per-process jax/axon init cost when A/B-ing solver knobs
(each config still pays its own XLA compile). Configs are given as
comma-separated KEY=VAL groups separated by ';' on the command line:

    python tools/bench_ab.py "BENCH_NOSLIP_CON=8" \
        "BENCH_LS_ITERS=4" "BENCH_REFACTOR=12"

An empty string group runs the shipped defaults.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

KNOBS = ('BENCH_BATCH', 'BENCH_STEPS', 'BENCH_TASK', 'BENCH_NCON',
         'BENCH_REFACTOR', 'BENCH_NOSLIP_CON', 'BENCH_SOLVER_ITERS',
         'BENCH_LS_ITERS')


def main():
    groups = sys.argv[1:] or ['']
    results = []
    for g in groups:
        for k in KNOBS:
            os.environ.pop(k, None)
        cfg = {}
        for kv in filter(None, (s.strip() for s in g.split(','))):
            k, v = kv.split('=', 1)
            os.environ[k] = v
            cfg[k] = v
        print(f'### config: {cfg or "defaults"}', flush=True)
        try:
            r = bench.main()
            results.append({'config': cfg, 'result': r})
        except Exception as e:  # noqa: BLE001 - record and continue the sweep
            entry = {'config': cfg, 'error': repr(e)[:200]}
            print(json.dumps(entry), flush=True)
            results.append(entry)
    # Combined summary (one JSON array) so the sweep is machine-readable
    # without scraping interleaved bench stdout.
    print('### summary')
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
