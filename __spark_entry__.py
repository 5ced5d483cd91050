"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pbf_spark.queries``; each Spark query and its
oracle SQL share literal constants and arithmetic order so hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pbf_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: deterministic event-derived points →
    S2 cell assignment → broadcast PIP join against the fixed concave
    polygon → per-polygon counts joined with hottest-cell stats.

    Exercises the engine's core path (cell index → filter-refine spatial
    join → aggregation) end-to-end on driver-provided data.
    """
    from pyspark.sql import functions as F

    from pbf_spark.operators.spatial import point_in_polygon_join, with_cells

    from pbf_spark.util import small_df

    pts = with_cells(Q.event_points(spark, SF0001), s2_level=13, hex_res=9)
    poly = small_df(
        spark,
        [("star", [{"lat": la, "lon": lo} for la, lo in Q.POLYGON], "test")],
        "polygon_id string, ring array<struct<lat:double,lon:double>>, category string",
    )
    hits = point_in_polygon_join(pts, poly, keep_polygon_cols=())
    return (
        hits.groupBy("polygon_id")
        .agg(
            F.count("*").alias("n_points_inside"),
            F.countDistinct("s2_cell").alias("n_s2_cells"),
            F.countDistinct("hex_cell").alias("n_hex_cells"),
            F.round(F.avg("lat"), 6).alias("centroid_lat"),
            F.round(F.avg("lon"), 6).alias("centroid_lon"),
        )
        .orderBy("polygon_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (omitted for non-SQL-expressible
    ops: s2_cell_counts, tile_density, doc_simhash → rows-only checks)."""
    return dict(Q.ORACLES)
