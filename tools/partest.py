#!/usr/bin/env python3
"""Parallel per-module pytest runner (r10, VERDICT r9 #6).

The full suite single-process is a round-cadence tax (58m36s recorded in
BASELINE.md at r9) and pytest-xdist is not installed in this container.
Every test module in this repo already builds ISOLATED state (tmp_path
txlog tables, per-module temp dirs, a session-scoped SparkSession of its
own process), so module-granularity process parallelism is safe:

    python tools/partest.py            # all of tests/, -j auto
    python tools/partest.py -j 6 tests/test_txlog*.py
    python tools/partest.py -- -k "merge"   # extra pytest args after --

Each worker subprocess runs `python -m pytest <module> -q` with
SPARK_GRAFT_CPUS divided across workers (min 4), so concurrent local
SparkSessions share the 32 hardware threads instead of oversubscribing
32x each. Long modules are scheduled first (static weights measured at
r10) to pack the tail. Exit code is nonzero if any module fails; a
per-module wall-clock table is printed for the BASELINE.md record.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured-at-r10 heavy modules, scheduled first (seconds are approximate
# single-process walls; anything unlisted defaults to 60)
WEIGHTS = {
    "test_txlog.py": 900,
    "test_txlog_round9.py": 600,
    "test_txlog_datasource.py": 420,
    "test_txlog_row_changes.py": 300,
    "test_txlog_round10.py": 240,
    "test_streaming.py": 300,
    "test_txlog_stream_limits.py": 240,
    "test_txlog_deletion_vectors.py": 240,
    "test_txlog_update.py": 180,
    "test_consolidate.py": 180,
    "test_engine_generalized.py": 180,
    "test_txlog_properties.py": 180,
    "test_similarity.py": 180,
    "test_dedup.py": 150,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", type=int, default=0, help="workers (0 = auto)")
    ap.add_argument("paths", nargs="*", help="test files/globs (default tests/)")
    ap.add_argument("--pytest-args", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    pats = args.paths or [os.path.join(REPO, "tests", "test_*.py")]
    files: list[str] = []
    for p in pats:
        files.extend(sorted(glob.glob(p if os.sep in p else os.path.join(REPO, "tests", p))))
    files = sorted(set(files), key=lambda f: -WEIGHTS.get(os.path.basename(f), 60))
    if not files:
        print("no test modules matched", file=sys.stderr)
        return 2

    hw = os.cpu_count() or 32
    jobs = args.j or max(2, min(6, len(files), hw // 5))
    cpus = max(4, hw // jobs)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    print(f"partest: {len(files)} modules, {jobs} workers, "
          f"SPARK_GRAFT_CPUS={env['SPARK_GRAFT_CPUS']}", flush=True)
    t0 = time.time()
    results: dict[str, tuple[int, float, str]] = {}

    def run(path: str) -> None:
        name = os.path.basename(path)
        t = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "pytest", path, "-q", "--no-header"]
            + list(args.pytest_args or []),
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
        )
        wall = time.time() - t
        tail = (p.stdout or "").strip().splitlines()
        summary = tail[-1] if tail else ""
        results[name] = (p.returncode, wall, summary)
        mark = "ok  " if p.returncode == 0 else "FAIL"
        print(f"{mark} {wall:7.1f}s {name}: {summary}", flush=True)
        if p.returncode != 0:
            sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-2000:] + "\n")

    with ThreadPoolExecutor(max_workers=jobs) as ex:
        list(ex.map(run, files))

    wall = time.time() - t0
    failed = sorted(n for n, (rc, _, _) in results.items() if rc != 0)
    print(f"\npartest total wall: {wall:.1f}s "
          f"({len(results) - len(failed)}/{len(results)} modules green)")
    if failed:
        print("failed modules:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
