"""1 vs 4 pinned-process memory-bandwidth control (no Spark, no engine).

Evidence for the single-host DRAM wall that caps multi-JVM scaling at
high cores-per-executor in tools/scaling_multi.py: K "executors" x C
single-threaded numpy stream-copy processes, pinned to the SAME disjoint
cpuset geometry as the engine protocol (executor g, lane j -> cpu
g*C + j), barrier-synced over a fixed window. If pure memcpy — zero
engine code — loses the same efficiency from K=1 to K=4 as the engine
does at that geometry, the degradation is the host's memory system, not
the engine. Aggregate GB/s per size; repeats keep the best window
(episodic host stalls, see BASELINE.md).

Usage:
  python tools/memcpy_control.py [--cores-per-worker 4] [--sizes 1,4]
      [--window 10] [--repeat 3] [--out bench_out/memcpy_control_c4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from multiprocessing import Barrier, Process, Queue
from pathlib import Path

BUF_MB = 64


def _lane(cpu: int, barrier, q, window: float) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    src = np.ones(BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm both buffers
    barrier.wait()
    end = time.time() + window
    n = 0
    while time.time() < end:
        np.copyto(dst, src)
        n += src.nbytes
    q.put(n)


def run_size(k: int, cores: int, window: float) -> float:
    """→ aggregate GB/s for k executors x cores lanes."""
    lanes = [(g * cores + j) for g in range(k) for j in range(cores)]
    barrier = Barrier(len(lanes) + 1)
    q: Queue = Queue()
    procs = [Process(target=_lane, args=(c, barrier, q, window)) for c in lanes]
    for p in procs:
        p.start()
    barrier.wait()
    t0 = time.time()
    total = sum(q.get() for _ in lanes)
    for p in procs:
        p.join()
    elapsed = max(time.time() - t0, window)
    return total / elapsed / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-per-worker", type=int, default=4)
    ap.add_argument("--sizes", default="1,4")
    ap.add_argument("--window", type=float, default=10.0)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    sizes = [int(x) for x in args.sizes.split(",")]
    out = Path(args.out or f"bench_out/memcpy_control_c{args.cores_per_worker}.json")

    levels: dict[str, float] = {}
    for k in sizes:
        best = 0.0
        for _ in range(args.repeat):
            best = max(best, run_size(k, args.cores_per_worker, args.window))
        levels[str(k)] = round(best, 2)
        print(f"== k={k}: {levels[str(k)]} GB/s aggregate")
    lo, hi = min(sizes), max(sizes)
    eff = round(levels[str(hi)] / (hi / lo * levels[str(lo)]), 3)
    result = {
        "protocol": (
            f"{lo} vs {hi} groups x {args.cores_per_worker} pinned single-thread numpy "
            f"memcpy procs ({BUF_MB} MB buffers), disjoint cpusets, best of "
            f"{args.repeat} x {args.window}s windows"
        ),
        "cores_per_worker": args.cores_per_worker,
        "levels_gbps": levels,
        "efficiency": eff,
    }
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
