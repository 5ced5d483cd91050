"""Round-6 per-query measurement harness (bench.py stays frozen).

Usage:
  python tools/qbench_r6.py [--sf DIR] [--runs N] [--plans] [query ...]

Times each named declared query (default: all) with the same
methodology as bench.py (warmup + min of N noop-sink runs), prints one
JSON line, and with --plans writes .explain("formatted") output to
plans/r06/<query>_<tag>.txt (tag via --tag, default "now").
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--tag", default="now")
    args = ap.parse_args()

    from pbf_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="qbench-r6", master=f"local[{cpus}]")

    import __spark_entry__ as em

    all_q = em.queries()
    names = args.queries or list(all_q)
    out: dict[str, float] = {}
    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        if args.plans:
            plans_dir = REPO / "plans" / "r06"
            plans_dir.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
            spark.catalog.clearCache()
        force(fn(spark, args.sf))  # warmup
        spark.catalog.clearCache()
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            force(fn(spark, args.sf))
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = min(times)
        print(f"# {name}: {times} -> {min(times)}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "queries": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
