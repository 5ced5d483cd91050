"""Deterministic hash-based sampling / dataset splitting.

Training pipelines need samples and train/val/test splits that are
REPRODUCIBLE — stable under repartitioning, cluster size, row order,
and re-runs — which rules out ``df.sample`` (seeded per-partition RNG:
the same row can flip splits when partitioning changes). The primitive
here keys every decision off ``md5(key || salt)``: a pure codegen
expression, no shuffle, no RNG state, portable to any SQL engine
(the DuckDB oracle uses the identical md5 bucket).

100-TB shape: embarrassingly parallel scan-time predicate — composes
under every other operator and pushes through column pruning; changing
``salt`` re-rolls every assignment without correlation to the old one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6): first 8 hex chars of
    md5(key || salt) — identical in Spark (`conv`) and DuckDB
    (`CAST('0x…' AS BIGINT)`), so oracles can replay assignments."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Same key
    (+ salt) ⇒ same decision on any cluster, any partitioning."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash-bucket
    thresholds (e.g. ``{"train": .8, "val": .1, "test": .1}``).
    Fractions must sum to 1 (±1e-9); assignment is per-key
    deterministic and leak-free: a key appears in exactly one split."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bucket = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(cum * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
