"""Split-process suite runner: bounds XLA:CPU resident-state accumulation.

One pytest process running the full ~470-test default tier accumulates
enough live XLA:CPU state on this single-core host to corrupt late
executions: r4 saw a segfault in a late pjit compile; r5 reproducibly saw
robust-jitter tests return wrong numerics (NaN factors whose ladder
check passed) in full and half-suite runs while passing standalone and
in small batches, with identical code and caches.  The per-module
``jax.clear_caches()`` fixture bounds compiled-executable state but not
whatever else the runtime accrues.

Narrowed reproduction (r5): the corrupted robust-jitter result needs
~200+ accumulated tests in one process — a 62-test 4-module run and every
pair of suspect modules pass; the 245-test half-suite shard fails the
same single test deterministically.  3 shards (~160 tests each) bound it
with margin.

This runner splits the test files into ``--shards`` alphabetical groups
and runs each in its OWN pytest process (sequentially — the host has one
core), aggregating exit codes.  Process isolation definitively bounds the
accumulation; the persistent on-disk compile cache keeps the extra
process startups cheap.

    python tests/run_suite.py                 # default tier, 3 shards
    python tests/run_suite.py --runslow       # full tier
    python tests/run_suite.py --shards 3 -x   # extra pytest args pass through
"""

import argparse
import glob
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shards", type=int, default=3)
    args, passthrough = ap.parse_known_args()

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    k = max(1, min(args.shards, len(files)))
    # contiguous alphabetical groups (stable, reproducible ordering)
    per = -(-len(files) // k)
    groups = [files[i : i + per] for i in range(0, len(files), per)]

    rc = 0
    t0 = time.time()
    for i, group in enumerate(groups):
        print(f"[suite] shard {i + 1}/{len(groups)}: "
              f"{len(group)} files", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *passthrough, *group]
        )
        rc = rc or r.returncode
    print(f"[suite] {len(groups)} shards in {time.time() - t0:.0f}s, "
          f"rc={rc}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
