"""Process-tree CPU accounting via /proc (no external deps).

Used by the scaling protocol to report CPU-time-per-entity alongside
wall-clock throughput: in local mode all parallelism levels share one
host memory system, so wall-clock strong scaling conflates plan quality
with host saturation. CPU seconds per entity is the saturation-free
signal — if it stays flat from N to 4N threads, the plan does no extra
work at higher parallelism and the wall gap is host contention, not a
shuffle/skew regression.

Covers the whole tree under the calling process: the PySpark driver, the
local-mode JVM, and every (daemon-reused) Python worker.
"""

from __future__ import annotations

import os

_CLK = os.sysconf("SC_CLK_TCK")


def _stat_fields(pid: int) -> tuple[int, float] | None:
    """(ppid, cpu_seconds) for a pid, or None if it vanished.

    Includes cutime/cstime (CPU of REAPED children): Spark's Python
    workers idle-timeout and exit mid-measurement; without the reaped
    accumulators their CPU would vanish from the live-tree sum and
    deltas could go negative."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            data = f.read().decode("ascii", "replace")
    except OSError:
        return None
    # comm may contain spaces/parens — split after the LAST ')'
    rp = data.rindex(")")
    rest = data[rp + 2 :].split()
    ppid = int(rest[1])  # field 4
    utime, stime = int(rest[11]), int(rest[12])  # fields 14, 15
    cutime, cstime = int(rest[13]), int(rest[14])  # fields 16, 17 (reaped)
    return ppid, (utime + stime + cutime + cstime) / _CLK


def descendants_cpu_seconds(root_pid: int | None = None) -> float:
    """Total utime+stime (seconds) of root_pid and all live descendants.

    Exited children ARE counted once reaped (cutime/cstime roll up to
    the parent), so per-phase deltas stay complete and non-negative even
    when idle Python workers time out mid-window.
    """
    root = root_pid or os.getpid()
    ppids: dict[int, int] = {}
    cpu: dict[int, float] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        st = _stat_fields(int(entry))
        if st is not None:
            ppids[int(entry)] = st[0]
            cpu[int(entry)] = st[1]

    total = cpu.get(root, 0.0)
    members = {root}
    # multiple passes handle arbitrary tree order cheaply (tree is tiny)
    changed = True
    while changed:
        changed = False
        for pid, ppid in ppids.items():
            if pid not in members and ppid in members:
                members.add(pid)
                total += cpu[pid]
                changed = True
    return total


class CpuTracker:
    """Sticky-membership CPU accounting for one worker's process tree.

    descendants_cpu_seconds() under-counts when a pyspark daemon exits
    and its idle workers reparent to init (they leave the tree and their
    CPU vanishes → negative deltas). Here membership is STICKY: once a
    pid joins the tree it is tracked until it disappears, at which point
    its last-known utime+stime is frozen into a tombstone total. cutime
    is never used, so nothing double-counts. Accuracy bound: CPU a pid
    burns between the last poll and its exit — our pollers sample at
    phase window edges and Spark workers only exit while idle, so the
    loss is ~0 for these workloads.
    """

    def __init__(self, root_pid: int | None = None) -> None:
        self.root = root_pid or os.getpid()
        self._live: dict[int, float] = {}
        self._dead_total = 0.0

    def total(self) -> float:
        stats: dict[int, tuple[int, float]] = {}
        for entry in os.listdir("/proc"):
            if entry.isdigit():
                st = _stat_fields_split(int(entry))
                if st is not None:
                    stats[int(entry)] = st
        members = {self.root}
        changed = True
        while changed:
            changed = False
            for pid, (ppid, _) in stats.items():
                if pid not in members and (ppid in members or pid in self._live):
                    members.add(pid)
                    changed = True
        for pid in list(self._live):
            if pid not in stats:  # exited → tombstone
                self._dead_total += self._live.pop(pid)
        for pid in members:
            if pid in stats:
                self._live[pid] = stats[pid][1]
        return self._dead_total + sum(self._live.values())


def _stat_fields_split(pid: int) -> tuple[int, float] | None:
    """(ppid, utime+stime seconds) — OWN cpu only, no reaped-child roll-up."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            data = f.read().decode("ascii", "replace")
    except OSError:
        return None
    rp = data.rindex(")")
    rest = data[rp + 2 :].split()
    return int(rest[1]), (int(rest[11]) + int(rest[12])) / _CLK
