"""Space-filling-curve clustering: the WRITE-side half of spatial speed.

Every read-side operator in this package (PIP join, kNN, range join,
tiles) prefilters by cell — but at 100 TB the dominant cost is the SCAN,
and a scan is only cheap if the storage layout lets Spark skip data.
This module clusters a point table along a Morton (Z-order) curve so
that spatially close rows land in the same parquet partition directory
and the same row groups:

* ``morton_key`` — pure-Catalyst int64 bit math (equirectangular grid →
  bit-spread interleave, no UDF, codegen-friendly): monotone in each of
  (x, y), so the key of any point inside a bbox is bounded by the keys
  of the bbox's (x0,y0)/(x1,y1) corners — the property that makes a
  1-D range predicate a sound bbox prefilter.
* ``write_clustered`` — partitionBy a coarse Morton prefix (directory-
  level partition pruning) + sortWithinPartitions on the full key
  (row-group min/max locality → parquet predicate pushdown skips
  row groups inside surviving directories).
* ``read_bbox`` — reconstructs the prefix-key set + full-key range for
  a bbox DRIVER-SIDE (tiny integer math, no data pass), applies them as
  ordinary filters so Catalyst prunes partitions at planning time, then
  refines with the exact lat/lon predicate.

100-TB shape: cluster once at ingest (one range shuffle), every bbox
query thereafter scans only the covering directories/row groups — the
same contract as Iceberg/Delta Z-ORDER table maintenance, expressed
with stock parquet + Catalyst. No reference counterpart (the reference
is a single-file streaming decoder); this is the Spark-native layer
above it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    """Spread the low 32 bits of ``v`` into the even bit positions of a
    64-bit value (classic magic-number interleave, fully codegen)."""
    for shift, mask in _SPREAD_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _grid_xy(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """Equirectangular integer grid cell at ``zoom`` (2^zoom × 2^zoom).
    No trig: clustering needs locality + monotonicity, not equal-area."""
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(n))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit((1 << zoom) - 1))
    return clamp(x).cast("long"), clamp(y).cast("long")


def morton_key(lat: Column, lon: Column, zoom: int = 14) -> Column:
    """Z-order key: bit-interleave of the equirectangular grid (x, y)
    at ``zoom``. Monotone in x and in y ⇒ for any bbox, every interior
    key lies in [key(x0,y0), key(x1,y1)]."""
    x, y = _grid_xy(lat, lon, zoom)
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def _morton_py(x: int, y: int) -> int:
    def spread(v: int) -> int:
        for shift, mask in _SPREAD_MASKS:
            v = (v | (v << shift)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def _bbox_grid_range(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float, zoom: int
) -> tuple[int, int, int, int]:
    n = 1 << zoom
    cl = lambda v: min(max(v, 0), n - 1)
    x0 = cl(int((lon_min + 180.0) / 360.0 * n))
    x1 = cl(int((lon_max + 180.0) / 360.0 * n))
    # y grows southward (90 - lat), so lat_max → y0
    y0 = cl(int((90.0 - lat_max) / 180.0 * n))
    y1 = cl(int((90.0 - lat_min) / 180.0 * n))
    return x0, x1, y0, y1


def write_clustered(
    df: DataFrame,
    path: str,
    zoom: int = 14,
    prefix_zoom: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
    target_partitions: int | None = None,
) -> None:
    """Write ``df`` parquet, Z-order-clustered on (lat, lon).

    Layout: directory partition column ``zp`` = Morton key at
    ``prefix_zoom`` (4^prefix_zoom dirs max — keep it coarse; 5 → ≤1024
    over the whole planet, far fewer over any real extent), rows range-
    partitioned AND sorted by the full-``zoom`` key ``z`` within
    directories. One range shuffle at write; bbox reads prune
    directories at plan time and row groups at scan time.
    """
    lat, lon = F.col(lat_col), F.col(lon_col)
    out = (
        df.withColumn("z", morton_key(lat, lon, zoom))
        .withColumn("zp", morton_key(lat, lon, prefix_zoom))
    )
    n_parts = target_partitions or out.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n_parts, "zp", "z")
        .sortWithinPartitions("zp", "z")
        .write.partitionBy("zp")
        .mode("overwrite")
        .parquet(path)
    )


def read_bbox(
    spark: SparkSession,
    path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    zoom: int = 14,
    prefix_zoom: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Bbox query over a :func:`write_clustered` table with partition +
    row-group pruning, then the exact predicate. The prefix-key set and
    full-key range are integer math on the bbox corners — no data pass,
    and both arrive at the scan as literal filters Catalyst can push."""
    x0, x1, y0, y1 = _bbox_grid_range(lat_min, lat_max, lon_min, lon_max, prefix_zoom)
    zp_keys = [
        _morton_py(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)
    ]
    fx0, fx1, fy0, fy1 = _bbox_grid_range(lat_min, lat_max, lon_min, lon_max, zoom)
    z_lo, z_hi = _morton_py(fx0, fy0), _morton_py(fx1, fy1)
    df = spark.read.parquet(path)
    return (
        df.where(F.col("zp").isin(zp_keys))  # directory pruning (plan time)
        .where(F.col("z").between(z_lo, z_hi))  # row-group pruning (scan time)
        .where(
            (F.col(lat_col) >= lat_min)
            & (F.col(lat_col) <= lat_max)
            & (F.col(lon_col) >= lon_min)
            & (F.col(lon_col) <= lon_max)
        )
        .drop("z", "zp")
    )
