"""Capture the AQE-FINAL physical plan of engine operators.

`explain()` before execution prints the initial plan
(`isFinalPlan=false`), which hides runtime rewrites like the AQE
sort-merge→shuffled-hash join conversion. This executes the DataFrame's
OWN QueryExecution JVM-side (no rows cross to Python) and then prints
the same QueryExecution's formatted plan — now the final adaptive plan.

Usage: python tools/capture_final_plan.py <out_dir>
Writes <out_dir>/engine_way_assembly_{before,after_exec}.txt etc.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import BENCH_FIXTURE, ensure_bench_fixture  # noqa: E402


def final_plan(df) -> str:
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()  # run JVM-side; rows never cross to Python
    return df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")


def initial_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "plans/r06")
    out_dir.mkdir(parents=True, exist_ok=True)
    ensure_bench_fixture()

    import os

    from pbf_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="plan-capture", master=f"local[{cpus}]")

    from pbf_spark.operators import decode, ways as ways_ops
    from pbf_spark.sources import iceberg_lite

    docs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "media_blobs")
    nodes = (
        decode.decode_documents(docs, blobs, columns=frozenset())
        .where("entity_type='node'")
        .select("id", "lat", "lon")
        .cache()
    )
    nodes.count()
    ways_df = (
        decode.decode_documents(docs, blobs, columns=frozenset({"refs"}), kinds=("way",), slim=True)
        .select("id", "refs")
        .cache()
    )
    ways_df.count()
    asm = ways_ops.assemble_way_geometries(ways_df, nodes)
    (out_dir / "engine_way_assembly_initial.txt").write_text(initial_plan(asm))
    (out_dir / "engine_way_assembly_final.txt").write_text(final_plan(asm))
    print("wrote way-assembly initial+final plans")


if __name__ == "__main__":
    main()
