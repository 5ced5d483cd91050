"""Explicit skew handling: salting utilities (SURVEY.md §2B B8).

Urban-density hot cells make cell-keyed joins/aggregations skewed. Two
mitigations compose here with AQE (spark.sql.adaptive.skewJoin.enabled is
on by default in session.py):

- ``salted_agg``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over ``n_salts`` reducers, final agg
  merges. Worth it when a single key's group dwarfs a task.
- ``salted_join``: hot-key equi-join — the large side gets a random
  salt, the small side is exploded across all salts, join key becomes
  (key, salt). Classic explode-replicate pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, n_salts: int, deterministic_col: str | None = None) -> DataFrame:
    """Add a salt in [0, n_salts). Deterministic when a column is given
    (hash-based — keeps retries/replays stable), else spark-random."""
    if deterministic_col is not None:
        salt = F.pmod(F.hash(F.col(deterministic_col)), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(SALT, salt)


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row across all salt values (small side of a join)."""
    return df.withColumn(SALT, F.explode(F.array([F.lit(i) for i in range(n_salts)])))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    deterministic_col: str | None = None,
) -> DataFrame:
    keys = list(on) + [SALT]
    return (
        with_salt(large, n_salts, deterministic_col)
        .join(explode_salts(small, n_salts), keys, how)
        .drop(SALT)
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
    deterministic_col: str | None = None,
) -> DataFrame:
    """Two-phase agg for algebraic functions (count/sum/min/max).

    ``agg_cols``: output_name → "count" | "sum:col" | "min:col" | "max:col".
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, spec in agg_cols.items():
        if spec == "count":
            partial_exprs.append(F.count("*").alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            fn, col = spec.split(":", 1)
            partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[fn]
            final_exprs.append(merge(f"_p_{out}").alias(out))
    salted = with_salt(df, n_salts, deterministic_col)
    partial = salted.groupBy(*keys, SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
