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
    """(ppid, cpu_seconds) for a pid, or None if it vanished."""
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
    return ppid, (utime + stime) / _CLK


def descendants_cpu_seconds(root_pid: int | None = None) -> float:
    """Total utime+stime (seconds) of root_pid and all live descendants.

    Exited children are not counted (Spark's Python workers are reused
    daemons, so per-phase deltas are complete in practice).
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
