"""PIP prefilter-level sweep: auto (data-driven per-polygon) vs manual.

Evidence for the verdict-4 done criterion: the auto-picked config must be
within ~10% of the best manual config on BOTH workloads —

  city:    the bench fixture's 192 tiny (9-vertex) polygons over the
           greater-london-scale node cloud (round 3 measured manual
           level 16 here 1.6x slower than 13: 41x covering for nothing);
  country: one 2400-vertex country-scale ring over a synthetic point
           cloud of the same cardinality (vertex-heavy boundary —
           exactly the shape that DOES earn a fine ladder).

Writes bench_out/pip_level_sweep.json and prints it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from bench import BENCH_FIXTURE, best_of, ensure_bench_fixture  # noqa: E402


def country_polygon(spark):
    """One vertex-heavy country-scale ring (the covering unit tests'
    wiggly coastline, 2400 vertices, ~10 deg across)."""
    th = np.linspace(0, 2 * np.pi, 2400, endpoint=False)
    r = 5.0 + 1.5 * np.sin(5 * th) + 0.8 * np.cos(11 * th)
    lat = 48 + r * np.sin(th)
    lon = 10 + r * np.cos(th) / np.cos(np.radians(48))
    import pandas as pd

    ring = [{"lat": float(a), "lon": float(o)} for a, o in zip(lat, lon)]
    pdf = pd.DataFrame({"polygon_id": ["country"], "ring": [ring], "category": ["country"]})
    from pbf_spark.model.schema import POLYGON_SCHEMA

    return spark.createDataFrame(pdf, POLYGON_SCHEMA)


def country_points(spark, n: int):
    """Deterministic synthetic points over the country bbox (pure
    codegen: no data movement, same cardinality class as the city run)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .withColumn("lat", (F.hash(F.col("id"), F.lit(1)) / 2147483647.0) * 8.0 + 48.0)
        .withColumn("lon", (F.hash(F.col("id"), F.lit(2)) / 2147483647.0) * 12.0 + 10.0)
        .select("id", "lat", "lon")
    )


def run_workload(spark, points, polys, configs: dict, rounds: int = 3) -> dict:
    """INTERLEAVED measurement: the host's throughput drifts on minute
    scale, so sequential per-config timing confounds config with drift
    (round 3's lesson). Build every index up front, then time configs
    round-robin A,B,C,A,B,C,... and keep each config's min."""
    import time

    from pbf_spark.operators import spatial

    built = {}
    for name, cfg in configs.items():
        index = spatial.build_polygon_index(spark, polys, keep_polygon_cols=(), **cfg)
        lv = max(index.levels)
        built[name] = {
            "index": index,
            "lv": lv,
            "cover_cells": index.cover_df.count(),
            "rows": spatial.point_in_polygon_join(points, index, level=lv).count(),  # warm
            "sec": float("inf"),
        }
    for _ in range(rounds):
        for name, b in built.items():
            t0 = time.time()
            spatial.point_in_polygon_join(points, b["index"], level=b["lv"]).count()
            b["sec"] = min(b["sec"], time.time() - t0)
    out = {}
    for name, b in built.items():
        out[name] = {
            "sec": round(b["sec"], 3),
            "rows": b["rows"],
            "cover_cells": b["cover_cells"],
            "finest": b["lv"],
        }
        b["index"].cover_df.unpersist()
        b["index"].edges_df.unpersist()
        print(f"{name}: {out[name]}", file=sys.stderr)
    rows = {v["rows"] for v in out.values()}
    assert len(rows) == 1, f"level must not change results: {rows}"
    return out


def main() -> None:
    ensure_bench_fixture()
    from pbf_spark.operators import decode
    from pbf_spark.session import get_spark
    from pbf_spark.sources import iceberg_lite

    spark = get_spark(app_name="pip-level-sweep")

    docs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, BENCH_FIXTURE / "media_blobs")
    nodes = (
        decode.decode_documents(docs, blobs, kinds=("node",), slim=True, columns=frozenset())
        .select("id", "lat", "lon")
        .cache()
    )
    n_nodes = nodes.count()
    city_polys = spark.read.parquet(str(BENCH_FIXTURE / "polygons.parquet"))

    out: dict = {"n_points": n_nodes}
    # manual configs disable the vertex-scaled budget (cells_per_vertex=
    # None) — they reproduce the raw ladder choice a caller would have
    # hand-set before round 4 (incl. the measured-bad city@16 config)
    configs = {
        "manual13": dict(level=13, cells_per_vertex=None),
        "manual16": dict(level=16, levels=(10, 13, 16), cells_per_vertex=None),
        "auto": dict(level=None),
    }
    city = run_workload(spark, nodes, city_polys, configs)
    for name, v in city.items():
        out[f"city_{name}"] = v

    cpolys = country_polygon(spark)
    cpoints = country_points(spark, n_nodes).cache()
    cpoints.count()
    country = run_workload(spark, cpoints, cpolys, configs)
    for name, v in country.items():
        out[f"country_{name}"] = v

    for wl in ("city", "country"):
        best_manual = min(out[f"{wl}_manual13"]["sec"], out[f"{wl}_manual16"]["sec"])
        out[f"{wl}_auto_vs_best_manual"] = round(out[f"{wl}_auto"]["sec"] / best_manual, 3)

    dest = REPO / "bench_out" / "pip_level_sweep.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
