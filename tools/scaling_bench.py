"""Two-cluster-size scaling protocol (BASELINE.md / north rule B11).

Runs tools/scaling_job.py via ``spark-submit --py-files`` at two
parallelism levels on the SAME fixture and reports throughput at both
plus scaling efficiency = thr(4N) / (4 · thr(N)).

Usage: python tools/scaling_bench.py [--levels 8,32] [--out bench_out/scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_pyfiles_zip(dest: Path) -> Path:
    zpath = dest / "pbf_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "pbf_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--repeat", type=int, default=1, help="spark-submit repetitions per level; per-metric best is kept")
    ap.add_argument("--out", default=str(REPO / "bench_out" / "scaling.json"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import bench

    manifest = bench.ensure_bench_fixture()
    fixture_dir = str(bench.BENCH_FIXTURE)

    spark_submit = shutil.which("spark-submit") or str(
        Path(os.environ.get("SPARK_HOME", "/opt/spark")) / "bin" / "spark-submit"
    )
    tmp = Path(tempfile.mkdtemp(prefix="pbf_scaling_"))
    zpath = build_pyfiles_zip(tmp)

    results = {}
    for n in levels:
        for rep in range(args.repeat):
            out_json = tmp / f"level_{n}_{rep}.json"
            cmd = [
                spark_submit,
                "--master",
                f"local[{n}]",
                "--driver-memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
                "--py-files",
                str(zpath),
                str(REPO / "tools" / "scaling_job.py"),
                fixture_dir,
                str(out_json),
            ]
            print(f"== level local[{n}] rep {rep}", file=sys.stderr)
            subprocess.run(cmd, check=True, cwd=tmp, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            r = json.loads(out_json.read_text())
            if n not in results:
                results[n] = r
            else:  # keep per-metric best across submits (IO-stall robustness)
                for m in ("decode", "pip_join", "tiles"):
                    if r[f"{m}_sec"] < results[n][f"{m}_sec"]:
                        results[n][f"{m}_sec"] = r[f"{m}_sec"]
                        for tm in (f"{m}_entities_per_sec", f"{m}_rows_per_sec"):
                            if tm in r:
                                results[n][tm] = r[tm]

    lo, hi = min(levels), max(levels)
    factor = hi / lo
    eff = {
        m: round(results[hi][m] / (factor * results[lo][m]), 3)
        for m in ("decode_entities_per_sec", "pip_join_rows_per_sec")
    }
    report = {
        "protocol": f"same job, same input, local[{lo}] vs local[{hi}] (stand-in for N vs {int(factor)}N executors)",
        "fixture_entities": manifest["total_entities"],
        "levels": results,
        "scaling_efficiency": eff,
        "target": ">=0.8",
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
