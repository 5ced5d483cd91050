"""Spatial operators: cell assignment + point-in-polygon join (B3/B4/B5).

Filter-refine spatial join, the classic distributed pattern:

1. polygons (a broadcast-scale dimension) → covering S2 level-13 cell
   sets, computed driver-side and **broadcast** — no shuffle of the big
   point side beyond the cell equi-join;
2. candidate pairs by cell equality (Catalyst broadcast hash join);
3. exact even-odd ray-cast refinement as a pure Catalyst expression
   (whole-stage codegen over the broadcast edge arrays — candidate rows
   never cross into Python).

At 100 TB the point side never moves: the only wide op is the final
aggregation the caller adds. Cell assignment itself is one numpy pass
per Arrow batch inside a pandas UDF; the polygon index (covering cells +
edges) is built once and reusable across batches (PolygonIndex).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..spatial import geometry, hexgrid, s2
from ..spatial.s2_expr import with_s2_cell


def s2_cell_udf(level: int = 13):
    @pandas_udf(T.LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = np.zeros(len(lat), dtype=np.int64)
        ok = lat.notna().to_numpy() & lon.notna().to_numpy()
        if ok.any():
            out[ok] = s2.lat_lon_to_cell_id(lat.to_numpy()[ok], lon.to_numpy()[ok], level)
        return pd.Series(np.where(ok, out, None), dtype="Int64")

    # nondeterministic flag = "evaluate exactly once": Catalyst otherwise
    # duplicates the UDF into the pushed-down isnotnull join-key filter
    return _udf.asNondeterministic()


def hex_cell_udf(res: int = 9):
    @pandas_udf(T.LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = np.zeros(len(lat), dtype=np.int64)
        ok = lat.notna().to_numpy() & lon.notna().to_numpy()
        if ok.any():
            out[ok] = hexgrid.geo_to_cell(lat.to_numpy()[ok], lon.to_numpy()[ok], res)
        return pd.Series(np.where(ok, out, None), dtype="Int64")

    return _udf


def with_cells(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    s2_level: int = 13,
    hex_res: int = 9,
) -> DataFrame:
    """Add ``s2_cell`` (level ``s2_level``) and ``hex_cell`` (res ``hex_res``).

    Both via batched numpy pandas UDFs — measured ~20x faster than the
    equivalent higher-order-function SQL expression (s2_expr.py), which
    Spark interprets per row; the expression form exists for the DuckDB
    oracle and produces bit-identical cells (validated on 200k points).
    The s2 UDF is marked nondeterministic solely to stop Catalyst from
    evaluating it twice (once for the join-key null filter, once for the
    projection).
    """
    return df.withColumn(
        "s2_cell", s2_cell_udf(s2_level)(F.col(lat_col), F.col(lon_col))
    ).withColumn("hex_cell", hex_cell_udf(hex_res)(F.col(lat_col), F.col(lon_col)))


# ---------------------------------------------------------------------------
# polygon covering + PIP join
# ---------------------------------------------------------------------------


def polygon_covering_cells(ring: np.ndarray, level: int = 13) -> np.ndarray:
    """S2 cells covering a polygon's bbox (superset of cells holding its
    interior points — a valid, cheap prefilter). Sampling at quarter-cell
    spacing guarantees every intersecting cell receives a sample."""
    glat, glon = _bbox_samples(ring, level)
    return np.unique(s2.lat_lon_to_cell_id(glat, glon, level))


def _bbox_samples(ring: np.ndarray, level: int):
    lat_min, lat_max, lon_min, lon_max = geometry.ring_bbox(ring)
    step_m = s2.cell_size_m(level) / 4.0
    step_lat = np.degrees(step_m / geometry.EARTH_RADIUS_M)
    step_lon = step_lat / max(np.cos(np.radians((lat_min + lat_max) / 2.0)), 0.05)
    lats = np.arange(lat_min - step_lat, lat_max + 2 * step_lat, step_lat)
    lons = np.arange(lon_min - step_lon, lon_max + 2 * step_lon, step_lon)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    return glat.ravel(), glon.ravel()


def _rings_from_rows(rows) -> dict[str, np.ndarray]:
    return {
        r["polygon_id"]: np.array([[p["lat"], p["lon"]] for p in r["ring"]], dtype=np.float64)
        for r in rows
    }


class PolygonIndex:
    """Reusable broadcast polygon index: covering cells + edge arrays.

    Built once per polygon layer (driver-side, vectorized across
    polygons), reused across any number of point batches — exactly how a
    streaming/batched pipeline amortizes the dimension side at scale.
    """

    def __init__(self, cover_df: DataFrame, edges_df: DataFrame, extra: dict):
        self.cover_df = cover_df
        self.edges_df = edges_df
        self.extra = extra


def build_polygon_index(
    spark: SparkSession, polygons: DataFrame, level: int = 13,
    keep_polygon_cols: tuple[str, ...] = ("category",),
) -> PolygonIndex:
    rows = polygons.collect()
    rings = _rings_from_rows(rows)
    extra = {r["polygon_id"]: tuple(r[c] for c in keep_polygon_cols) for r in rows}

    # one vectorized S2 pass over the sample grids of ALL polygons
    sample_lat, sample_lon, sample_pid = [], [], []
    for pid, ring in rings.items():
        glat, glon = _bbox_samples(ring, level)
        sample_lat.append(glat)
        sample_lon.append(glon)
        sample_pid.append(np.full(glat.size, pid, dtype=object))
    cells = s2.lat_lon_to_cell_id(np.concatenate(sample_lat), np.concatenate(sample_lon), level)
    cover_pdf = pd.DataFrame(
        {"s2_cell": cells, "polygon_id": np.concatenate(sample_pid)}
    ).drop_duplicates()
    cover_df = spark.createDataFrame(cover_pdf.astype({"s2_cell": "int64", "polygon_id": "string"}))

    edge_rows = []
    for pid, ring in rings.items():
        r = ring[:-1] if (ring.shape[0] > 1 and (ring[0] == ring[-1]).all()) else ring
        edges = [
            {
                "y1": float(r[i, 0]),
                "x1": float(r[i, 1]),
                "y2": float(r[(i + 1) % len(r), 0]),
                "x2": float(r[(i + 1) % len(r), 1]),
            }
            for i in range(len(r))
        ]
        edge_rows.append((pid, edges))
    from ..util import small_df

    edges_df = small_df(
        spark,
        edge_rows,
        "polygon_id string, _edges array<struct<y1:double,x1:double,y2:double,x2:double>>",
    )
    # materialize both sides: the index is rebuilt otherwise on every join
    # (small_df's python task would re-run serially per query)
    cover_df = cover_df.cache()
    edges_df = edges_df.cache()
    cover_df.count()
    edges_df.count()
    return PolygonIndex(cover_df, edges_df, extra)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame | PolygonIndex,
    level: int = 13,
    lat_col: str = "lat",
    lon_col: str = "lon",
    keep_polygon_cols: tuple[str, ...] = ("category",),
) -> DataFrame:
    """Exact PIP join: each point row × each polygon containing it.

    ``polygons`` is either the polygon DataFrame (broadcast-scale
    dimension; index built on the fly) or a prebuilt PolygonIndex.
    """
    spark: SparkSession = points.sparkSession
    if isinstance(polygons, PolygonIndex):
        index = polygons
    else:
        index = build_polygon_index(spark, polygons, level, keep_polygon_cols)
    cover_df = index.cover_df
    extra = index.extra

    # refine stays JVM-side: the even-odd ray cast is a whole-stage-codegen
    # aggregate over the polygon's (broadcast) edge array — candidate rows
    # never cross into Python (same arithmetic as geometry.points_in_ring
    # and the SQL oracle: half-open rule, strict <)
    edges_df = index.edges_df
    inside = F.expr(
        f"""
        aggregate(_edges, 0, (acc, e) -> acc + IF(
            ((e.y1 > {lat_col}) != (e.y2 > {lat_col}))
            AND {lon_col} < e.x1 + ({lat_col} - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1),
            1, 0)) % 2 = 1
        """
    )

    pts = points
    if "s2_cell" not in pts.columns:
        pts = pts.withColumn("s2_cell", s2_cell_udf(level)(F.col(lat_col), F.col(lon_col)))
    cand = pts.join(F.broadcast(cover_df), "s2_cell").join(F.broadcast(edges_df), "polygon_id")
    result = cand.where(inside).drop("_edges")
    if keep_polygon_cols:
        extra_rows = [(k, *v) for k, v in extra.items()]
        extra_df = spark.createDataFrame(
            pd.DataFrame(extra_rows, columns=["polygon_id", *keep_polygon_cols])
        )
        result = result.join(F.broadcast(extra_df), "polygon_id")
    return result
