"""Host-contention guard for benchmark harnesses.

Round-4 lesson (BENCH_NOTES "Config-4 round-4 re-measure"): on this 1-core
host, a concurrently-running CPU test suite depressed a config-4 measurement
~20% (44.0 vs 54.2 f/s) and the number entered the notes unlabeled; round 3's
65.4 f/s likewise proved unreproducible under controlled conditions. Decode,
bank assembly, and dispatch are all host-side, so host load is part of every
measured number. This module makes that state explicit:

- ``snapshot()`` records the 1-minute load average, CPU count, and any OTHER
  runnable processes (state R in ``/proc/*/stat``, excluding this process
  tree) at call time.
- ``guard()`` takes a snapshot, prints a loud stderr warning when the host
  looks contended, and — when ``BENCH_REQUIRE_IDLE=1`` — refuses to run
  (exit 4) so a contended number cannot be recorded silently.

Every bench harness embeds the snapshot in its JSON output (keys
``host_load1`` / ``host_contended`` on the driver line; a ``host_load`` dict
elsewhere), so any future number carries the conditions it was measured
under. The reference has no benchmarks at all (SURVEY.md §6); this guard is
measurement discipline for the rebuild's own harnesses.
"""

from __future__ import annotations

import os
import sys
import typing as T

# A 1-minute load above this fraction of the core count at bench START means
# something else is (or was very recently) competing for the CPU. The bench
# process itself has not started spinning yet at snapshot time, but load1 has
# a ~1-minute memory, so fixture building / compile phases of the bench's own
# process can contribute; the threshold is therefore permissive (0.75/core)
# and the raw value is always recorded for later judgment.
CONTENTION_LOAD_FRAC = 0.75


def _my_process_group() -> set:
    """PIDs of this process and its ancestors (shell wrappers etc.)."""
    pids = set()
    pid = os.getpid()
    for _ in range(16):
        pids.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                fields = f.read().split()
            pid = int(fields[3])  # ppid
        except (OSError, ValueError, IndexError):
            break
        if pid <= 1:
            break
    return pids


def _runnable_others() -> T.List[str]:
    """Names of OTHER processes currently in state R (running/runnable)."""
    mine = _my_process_group()
    out = []
    try:
        entries = os.listdir("/proc")
    except OSError:
        return out
    for e in entries:
        if not e.isdigit() or int(e) in mine:
            continue
        try:
            with open(f"/proc/{e}/stat") as f:
                fields = f.read().split()
            # comm can contain spaces but is parenthesized; state is the
            # field after the closing paren
            raw = " ".join(fields)
            close = raw.rindex(")")
            state = raw[close + 1 :].split()[0]
            if state == "R":
                out.append(raw[raw.index("(") + 1 : close])
        except (OSError, ValueError, IndexError):
            continue
    return out


def snapshot() -> dict:
    """One-shot host-load record: take it immediately before timing starts."""
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:  # pragma: no cover - /proc-less platforms
        load1 = load5 = -1.0
    ncpu = os.cpu_count() or 1
    others = _runnable_others()
    contended = bool(others) or (
        load1 >= 0 and load1 > CONTENTION_LOAD_FRAC * ncpu
    )
    return {
        "load1": round(load1, 2),
        "load5": round(load5, 2),
        "ncpu": ncpu,
        "busy_others": others[:8],
        "contended": contended,
    }


def guard(harness: str = "bench") -> dict:
    """Snapshot + loud label; refuse under ``BENCH_REQUIRE_IDLE=1``.

    Returns the snapshot so the caller can embed it in its output JSON.
    """
    snap = snapshot()
    if snap["contended"]:
        msg = (
            f"{harness}: HOST CONTENDED at measurement time "
            f"(load1={snap['load1']} on {snap['ncpu']} core(s)"
            + (
                f"; runnable: {', '.join(snap['busy_others'])}"
                if snap["busy_others"]
                else ""
            )
            + ") — numbers from this run are NOT comparable to idle-host "
            "entries in BENCH_NOTES.md"
        )
        print(msg, file=sys.stderr)
        sys.stderr.flush()
        if os.environ.get("BENCH_REQUIRE_IDLE", "0").lower() in (
            "1",
            "true",
            "yes",
        ):
            print(
                f"{harness}: refusing to measure on a contended host "
                "(BENCH_REQUIRE_IDLE=1)",
                file=sys.stderr,
            )
            raise SystemExit(4)
    return snap
