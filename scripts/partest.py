#!/usr/bin/env python
"""Run the test suite as N concurrent pytest processes, one file at a
time per worker, to keep the per-commit cadence affordable as tests
accrete (the serial suite passed 21:48 wall at r12).

Why not pytest-xdist: it is not installed in this environment and
installs are forbidden; a file-granular work queue over subprocesses
needs no plugin and gives each worker its own JVM/SparkSession anyway
(sessions are per-process, so two workers can never share Spark
state). Workers run local[8]/8g sessions (tests/conftest.py), so the
default 5 workers fit a 32-core / 128 GiB host (measured r13: four
consecutive zero-flake full runs, 525 passed / 2 skipped, 6.3-7.5 min
each vs 21:48 serial).

Scheduling: longest-expected-first (LPT) from the freshest timings
available — the gitignored per-host overlay
`scripts/partest_timings.local.json` when present, else the committed
seed `scripts/partest_timings.json` (falls back to file size for new
files) — drained from a shared queue, no static partitioning to
rebalance as tests move. Each run rewrites only the LOCAL overlay, so
routine runs stop churning the committed file in every diff; refresh
the committed snapshot deliberately (once per round is plenty) with
`--refresh-committed`.

Isolation notes (why per-file processes are safe here):
- pytest tmp_path roots are per-process-numbered and lock-protected;
- no test touches a shared warehouse/metastore (grep-verified: no
  enableHiveSupport, no spark-warehouse writes);
- `-p no:cacheprovider` avoids concurrent .pytest_cache writes.

Timing-sensitive files (streaming trigger waits, cross-process lock
races) are listed in LOAD_SENSITIVE and scheduled onto ONE dedicated
worker so they never run concurrently with each other — they still
overlap ordinary files, which measurement showed they tolerate.

Exit code: 0 only if every pytest invocation exited 0 (or 5 — "no
tests collected", an empty file, not a failure; serial pytest over the
whole dir would have passed). A per-file summary plus the aggregate
pass/fail/skip counts print at the end.

    python scripts/partest.py              # 5 workers
    python scripts/partest.py --workers 6
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import queue
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
TIMINGS = os.path.join(REPO, "scripts", "partest_timings.json")
TIMINGS_LOCAL = os.path.join(REPO, "scripts", "partest_timings.local.json")

# Files whose tests wait on wall-clock (streaming triggers,
# cross-process flock races): one dedicated worker runs them
# back-to-back so they never compete with EACH OTHER for timers.
LOAD_SENSITIVE = (
    "test_streaming.py",
    "test_streaming_late_data.py",
    "test_streaming_recovery.py",
    "test_streaming_sinks.py",
    "test_fsck.py",
)

_SUMMARY = re.compile(r"(\d+) (passed|failed|skipped|error)")
# pytest's terminal summary line always carries the run duration
# ("5 passed in 1.23s", "no tests ran in 0.10s"); count-shaped text in a
# test's captured output does not — this is what anchors the scan below
_SUMMARY_LINE = re.compile(r"\bin \d+\.\d+s\b")


def discover() -> list[str]:
    return sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(TESTS, "test_*.py"))
    )


def expected_cost(fname: str, timings: dict[str, float]) -> float:
    if fname in timings:
        return timings[fname]
    # new file: rank by source size (roughly proportional to runtime
    # here), scaled into the timing range so it schedules early-ish
    return os.path.getsize(os.path.join(TESTS, fname)) / 1000.0


def run_file(fname: str) -> tuple[int, float, dict[str, int], str]:
    t0 = time.monotonic()
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            os.path.join("tests", fname),
            "-q",
            "--tb=short",
            "-p",
            "no:cacheprovider",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    wall = time.monotonic() - t0
    counts = parse_counts(proc.stdout)
    # keep the streams separate in the failure tail: chatty stderr
    # (JVM/log4j shutdown noise) must not push pytest's traceback and
    # summary — which live in stdout — out of the FAILED block
    out_tail = proc.stdout.strip().splitlines()[-20:]
    err_tail = proc.stderr.strip().splitlines()[-8:]
    tail = "\n".join(
        out_tail + (["--- stderr ---", *err_tail] if err_tail else [])
    )
    return proc.returncode, wall, counts, tail


def parse_counts(stdout: str) -> dict[str, int]:
    """Counts from the LAST duration-stamped summary line only: a
    test's captured stdout can itself contain "N passed"-shaped text
    (the subprocess-running tooling tests echo inner pytest output on
    failure), and a tail like "no tests ran in 0.10s" or
    "5 deselected in 0.01s" has no count tokens at all — anchoring on
    the "... in 1.23s" stamp stops the scan at the real terminal
    summary in both cases instead of walking up into test output."""
    counts: dict[str, int] = {}
    for line in reversed(stdout.splitlines()):
        if not _SUMMARY_LINE.search(line):
            continue
        for n, kind in _SUMMARY.findall(line):
            counts[kind] = counts.get(kind, 0) + int(n)
        break
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--refresh-committed",
        action="store_true",
        help="also rewrite the committed scripts/partest_timings.json "
        "seed (default: only the gitignored .local overlay)",
    )
    ap.add_argument(
        "--workers",
        type=int,
        default=int(os.environ.get("PARTEST_WORKERS", "5")),
        help="concurrent pytest processes (each local[8]/8g)",
    )
    args = ap.parse_args()

    # freshest-first: the per-host local overlay (written every run,
    # gitignored) beats the committed seed (a per-round snapshot)
    timings: dict[str, float] = {}
    for source in (TIMINGS_LOCAL, TIMINGS):
        if os.path.exists(source):
            try:
                with open(source, encoding="utf-8") as fh:
                    timings = json.load(fh)
                break
            except (ValueError, OSError):
                # a truncated timings file (interrupted previous run)
                # must not brick the runner — try the next source,
                # else size-fallback scheduling
                timings = {}

    files = discover()
    sensitive = [f for f in files if f in LOAD_SENSITIVE]
    ordinary = [f for f in files if f not in LOAD_SENSITIVE]
    if args.workers <= 1:
        # a single worker is already fully serial — no second lane
        ordinary += sensitive
        sensitive = []
    ordinary.sort(key=lambda f: -expected_cost(f, timings))
    sensitive.sort(key=lambda f: -expected_cost(f, timings))

    q: queue.Queue[str] = queue.Queue()
    for f in ordinary:
        q.put(f)

    results: dict[str, tuple[int, float, dict[str, int], str]] = {}
    lock = threading.Lock()

    def ordinary_worker() -> None:
        while True:
            try:
                f = q.get_nowait()
            except queue.Empty:
                return
            res = run_file(f)
            with lock:
                results[f] = res
                print(
                    f"  {f}: rc={res[0]} {res[1]:.1f}s {res[2]}",
                    flush=True,
                )

    def sensitive_worker() -> None:
        # back-to-back on one worker: load-sensitive files never
        # overlap each other
        for f in sensitive:
            res = run_file(f)
            with lock:
                results[f] = res
                print(
                    f"  {f}: rc={res[0]} {res[1]:.1f}s {res[2]} [serial-lane]",
                    flush=True,
                )
        # lane drained: help with the ordinary queue instead of idling
        # one of the N workers for the rest of the run (sensitive files
        # tolerate overlapping ORDINARY files — see module docstring —
        # only sensitive-vs-sensitive overlap is forbidden, and by now
        # none of those is left to start)
        ordinary_worker()

    t0 = time.monotonic()
    n_ordinary = max(1, args.workers - (1 if sensitive else 0))
    threads = [
        threading.Thread(target=ordinary_worker, daemon=True)
        for _ in range(n_ordinary)
    ]
    if sensitive:
        threads.append(threading.Thread(target=sensitive_worker, daemon=True))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    total: dict[str, int] = {}
    failed = []
    for f, (rc, dur, counts, tail) in sorted(results.items()):
        for k, v in counts.items():
            total[k] = total.get(k, 0) + v
        if rc == 5:
            # "no tests collected" — an empty/fully-deselected file is
            # not a failure (serial pytest over the whole dir would
            # have passed); surface it without going red
            print(f"note: {f} collected no tests (rc=5)")
        elif rc != 0:
            failed.append(f)
            print(f"\n=== FAILED {f} (rc={rc}) ===\n{tail}\n")

    # Merge into the loaded seed rather than replace it: a failed file's
    # fail-fast duration (2 s collection error for a 180 s file) must
    # not skew the next run's LPT order, and files a crashed run never
    # reached keep their old timing. Written atomically so an
    # interrupted dump can't leave truncated JSON for the next run.
    for f, (rc, dur, _counts, _tail) in results.items():
        if rc == 0:
            timings[f] = round(dur, 2)
    timings = {f: t for f, t in timings.items() if f in set(files)}
    targets = [TIMINGS_LOCAL]
    if args.refresh_committed:
        targets.append(TIMINGS)
    for target in targets:
        tmp = target + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(timings, fh, indent=0, sort_keys=True)
        os.replace(tmp, target)

    print(
        f"partest: {len(results)} files in {wall / 60:.1f} min "
        f"({args.workers} workers) — {total}"
    )
    # report incomplete coverage even when some file also failed — a
    # dead worker's abandoned files must not hide behind exit 1
    missing = set(files) - set(results)
    if missing:
        print(f"files never ran: {sorted(missing)}")
    if failed:
        print(f"FAILED files: {failed}")
        raise SystemExit(1)
    if missing:
        raise SystemExit(2)
    print("all green")


if __name__ == "__main__":
    main()
