"""Spatial operators: cell assignment + point-in-polygon join (B3/B4/B5).

Filter-refine spatial join, the classic distributed pattern:

1. polygons (a broadcast-scale dimension) → covering S2 level-13 cell
   sets, computed driver-side and **broadcast** — no shuffle of the big
   point side beyond the cell equi-join;
2. candidate pairs by cell equality (Catalyst broadcast hash join);
3. exact even-odd ray-cast refinement in an Arrow-batched pandas UDF.

At 100 TB the point side never moves: the only wide op is the final
aggregation the caller adds. Cell assignment itself is a narrow
mapInPandas-free pandas UDF (one numpy pass per Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..spatial import geometry, hexgrid, s2


def s2_cell_udf(level: int = 13):
    @pandas_udf(T.LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = np.zeros(len(lat), dtype=np.int64)
        ok = lat.notna().to_numpy() & lon.notna().to_numpy()
        if ok.any():
            out[ok] = s2.lat_lon_to_cell_id(lat.to_numpy()[ok], lon.to_numpy()[ok], level)
        return pd.Series(np.where(ok, out, None), dtype="Int64")

    return _udf


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
    """Add ``s2_cell`` (level ``s2_level``) and ``hex_cell`` (res ``hex_res``)."""
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
    lat_min, lat_max, lon_min, lon_max = geometry.ring_bbox(ring)
    step_m = s2.cell_size_m(level) / 4.0
    step_lat = np.degrees(step_m / geometry.EARTH_RADIUS_M)
    step_lon = step_lat / max(np.cos(np.radians((lat_min + lat_max) / 2.0)), 0.05)
    lats = np.arange(lat_min - step_lat, lat_max + 2 * step_lat, step_lat)
    lons = np.arange(lon_min - step_lon, lon_max + 2 * step_lon, step_lon)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    return np.unique(s2.lat_lon_to_cell_id(glat.ravel(), glon.ravel(), level))


def _rings_from_rows(rows) -> dict[str, np.ndarray]:
    return {
        r["polygon_id"]: np.array([[p["lat"], p["lon"]] for p in r["ring"]], dtype=np.float64)
        for r in rows
    }


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    level: int = 13,
    lat_col: str = "lat",
    lon_col: str = "lon",
    keep_polygon_cols: tuple[str, ...] = ("category",),
) -> DataFrame:
    """Exact PIP join: each point row × each polygon containing it.

    ``polygons`` must be broadcast-scale (dimension table): rings are
    collected once, covering cells built driver-side, and both the
    cell→polygon map and the raw rings are broadcast.
    """
    spark: SparkSession = points.sparkSession
    rows = polygons.collect()
    rings = _rings_from_rows(rows)
    extra = {r["polygon_id"]: tuple(r[c] for c in keep_polygon_cols) for r in rows}

    cover = [
        (int(cell), r["polygon_id"])
        for r in rows
        for cell in polygon_covering_cells(rings[r["polygon_id"]], level)
    ]
    cover_df = spark.createDataFrame(cover, f"s2_cell long, polygon_id string")

    bc_rings = spark.sparkContext.broadcast(rings)

    @pandas_udf(T.BooleanType())
    def _refine(pid: pd.Series, lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = np.zeros(len(pid), dtype=bool)
        la, lo = lat.to_numpy(np.float64), lon.to_numpy(np.float64)
        pids = pid.to_numpy()
        for p in pd.unique(pids):
            m = pids == p
            out[m] = geometry.points_in_ring(la[m], lo[m], bc_rings.value[p])
        return pd.Series(out)

    pts = points
    if "s2_cell" not in pts.columns:
        pts = pts.withColumn("s2_cell", s2_cell_udf(level)(F.col(lat_col), F.col(lon_col)))
    cand = pts.join(F.broadcast(cover_df), "s2_cell")
    result = cand.where(_refine(F.col("polygon_id"), F.col(lat_col), F.col(lon_col)))
    if keep_polygon_cols:
        extra_rows = [(k, *v) for k, v in extra.items()]
        schema = ", ".join(["polygon_id string"] + [f"{c} string" for c in keep_polygon_cols])
        result = result.join(F.broadcast(spark.createDataFrame(extra_rows, schema)), "polygon_id")
    return result
