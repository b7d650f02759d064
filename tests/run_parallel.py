"""Parallel test runner — the suite sharded across worker processes.

pytest-xdist is not available in this environment, so this runner does
the same job with stdlib only: a dynamic queue of test FILES drained by
N worker subprocesses, each a plain ``python -m pytest <file>`` with its
own JVM/SparkSession (the conftest's session fixture is per-process, so
isolation is exactly what a fresh single-file run gets — no shared
catalog, no shared Spark state; the only cross-process surfaces are
pytest's self-locking tmp roots and hypothesis's per-example DB, both
concurrency-safe).

Scheduling: files are queued longest-first using measured durations from
the previous run (``tests/.test_durations.json``, refreshed on every
run), falling back to line count for new files.  Dynamic draining means
a straggler file never idles the other workers — the wall time is
max(longest single file, total/N) plus per-process session startup.

Usage:
    python tests/run_parallel.py            # all tests, cpu/4 workers
    python tests/run_parallel.py -j 6      # explicit worker count
    python tests/run_parallel.py -k expr   # forwarded to pytest

Exit code: 0 iff every file's pytest exited 0 (or 5 = nothing collected,
which -k makes routine); the summary names each failing file and replays
its captured output.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import subprocess
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DURATIONS_PATH = os.path.join(HERE, ".test_durations.json")


def collect_files() -> list[str]:
    return sorted(
        f for f in os.listdir(HERE) if f.startswith("test_") and f.endswith(".py")
    )


def predicted_cost(f: str, durations: dict) -> float:
    if f in durations:
        return float(durations[f])
    with open(os.path.join(HERE, f)) as fh:
        return sum(1 for _ in fh) / 10.0  # line-count proxy for new files


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", "--workers", type=int,
                    default=max(2, (os.cpu_count() or 8) // 4))
    ap.add_argument("-k", default=None, help="forwarded to pytest -k")
    ap.add_argument("files", nargs="*", help="explicit test files (default all)")
    args = ap.parse_args()

    durations: dict = {}
    if os.path.exists(DURATIONS_PATH):
        try:
            durations = json.load(open(DURATIONS_PATH))
        except (json.JSONDecodeError, OSError):
            durations = {}

    files = args.files or collect_files()
    files = sorted(files, key=lambda f: -predicted_cost(os.path.basename(f), durations))

    q: "queue.Queue[str]" = queue.Queue()
    for f in files:
        q.put(f)

    env = dict(os.environ)
    # keep the conftest's full 8g per worker JVM: heap is committed
    # lazily, so 8 workers x 8g of HEADROOM is fine on this host, while
    # a hard 4g cap made the heaviest e2e file OOM under contention

    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()

    def worker() -> None:
        while True:
            try:
                f = q.get_nowait()
            except queue.Empty:
                return
            path = f if os.path.isabs(f) else os.path.join(HERE, os.path.basename(f))
            cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
                   "--no-header", path]
            if args.k:
                cmd += ["-k", args.k]
            t0 = time.time()
            p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
            dt = time.time() - t0
            out = p.stdout + p.stderr
            with lock:
                results[os.path.basename(f)] = (p.returncode, dt, out)
                status = "ok" if p.returncode in (0, 5) else "FAIL"
                print(f"[{len(results):>3}/{len(files)}] {status:4} "
                      f"{os.path.basename(f):44} {dt:7.1f}s", flush=True)

    t0 = time.time()
    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(min(args.workers, len(files)))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    # refresh the duration map for next run's longest-first ordering
    new_durations = dict(durations)
    for f, (_code, dt, _out) in results.items():
        new_durations[f] = round(dt, 1)
    if not args.k and not args.files:
        try:
            json.dump(new_durations, open(DURATIONS_PATH, "w"), indent=0,
                      sort_keys=True)
        except OSError:
            pass

    failed = [f for f, (code, _dt, _out) in results.items() if code not in (0, 5)]
    retried_ok = []
    for f in list(failed):
        # isolate contention flakes: one serial retry with the machine
        # to itself; a genuine failure fails again and keeps its output
        print(f"\n--- serial retry: {f}", flush=True)
        path = os.path.join(HERE, f)
        cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
               "--no-header", path]
        if args.k:
            cmd += ["-k", args.k]
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
        if p.returncode in (0, 5):
            failed.remove(f)
            retried_ok.append(f)
            print(f"--- {f}: PASSED on serial retry (parallel-run flake)")
        # keep the FINAL run's output either way, so the tally below
        # reflects post-retry suite health, not the flaky first attempt
        results[f] = (p.returncode, results[f][1], p.stdout + p.stderr)

    # tally from the final per-file outputs (post-retry), not the
    # parallel phase — a retried-green file must not leave stale
    # failure counts in the summary
    import re as _re

    counts = {"passed": 0, "failed": 0, "skipped": 0}
    for _code, _dt, out in results.values():
        for n, what in _re.findall(r"(\d+) (passed|failed|skipped|error)", out):
            key = {"error": "failed"}.get(what, what)
            counts[key] = counts.get(key, 0) + int(n)

    for f in failed:
        print(f"\n===== {f} output =====")
        print(results[f][2][-12000:])
    print(f"\n{len(files)} files, {counts.get('passed', 0)} passed, "
          f"{counts.get('failed', 0)} failed, {counts.get('skipped', 0)} skipped, "
          f"{len(failed)} failing files"
          + (f" ({len(retried_ok)} passed on serial retry: {retried_ok})"
             if retried_ok else "")
          + f", wall {wall/60:.1f} min ({args.workers} workers)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
