"""Temporal operators: batch sessionization and as-of join.

Both are classic event-pipeline operators Spark has no single built-in
for, expressed as window-function compositions so the whole plan stays
in Catalyst/codegen (no UDF, no driver collect):

- ``sessionize``: gap-based sessions per key — the batch twin of the
  streaming ``applyInPandasWithState`` sessionizer (streaming/
  pipeline.py). ONE shuffle on the key; window state is a running sum.
- ``asof_join``: each left row matched to the latest right row at a
  strictly earlier event time per key, via the union + ignorenulls-last
  trick — the scalable alternative to a per-key range join (one shuffle
  on the key, no range explosion, skew bounded by per-key row counts).

100-TB shape: both ops shuffle once on the partition key; with the
input bucketed by that key they co-locate and the exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unix_micros(col):
    """unix_micros for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ is read
    from plain parquet; with a UTC session the cast preserves the
    instant, matching DuckDB's epoch_us on the same file)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap_seconds``.

    → (key, session_id, session_start, session_end, n_events[, sum_value])
    with session_id numbering sessions 1..n per key in time order.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    # microsecond integer arithmetic: event timestamps carry sub-second
    # precision, and the DuckDB oracle (epoch_us) must agree bit-exactly.
    # cast("timestamp") lifts TIMESTAMP_NTZ inputs (session tz is UTC, so
    # the instant is preserved and unix_micros matches DuckDB epoch_us)
    us = _unix_micros(F.col(ts_col))
    new_session = F.when(
        us - F.lag(us).over(w) > F.lit(int(gap_seconds) * 1_000_000),
        1,
    ).otherwise(0)
    # first row per key has a NULL lag → when() yields 0; number from 1
    sessions = events.withColumn("_new", new_session).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + F.lit(1),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return sessions.groupBy(key_col, "session_id").agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: tuple[str, ...] = ("event_id",),
    tiebreak_col: str = "event_id",
    strict: bool = True,
) -> DataFrame:
    """As-of join: each ``left`` row × the latest ``right`` row with
    right.ts < left.ts (``strict``; <= otherwise) for the same key.

    Rows from both sides are unioned, ordered per key by (ts, side,
    tiebreak) and the right side's carried columns are propagated with
    ``last(..., ignorenulls=True)`` — at equal timestamps the side
    ordering decides whether the right row is visible to the left row
    (strict: right sorts AFTER left at the same ts, so it is not).
    Output: left's key/ts/left_cols + right_cols prefixed ``asof_`` +
    ``asof_ts``. Left rows with no match are dropped (inner semantics).
    """
    lc = [F.col(c) for c in (key_col, ts_col, *left_cols)]
    l_tag = left.select(
        *lc,
        F.lit(0 if strict else 1).alias("_side"),
        F.col(tiebreak_col).alias("_ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.lit(1 if strict else 0).alias("_side"),
        F.col(tiebreak_col).alias("_ord"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = l_tag.unionByName(r_tag)
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols
    ] + [F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts")]
    out = seq.select(key_col, ts_col, *left_cols, "_side", *carried)
    is_left = F.col("_side") == F.lit(0 if strict else 1)
    return out.where(is_left & F.col("asof_ts").isNotNull()).drop("_side")
