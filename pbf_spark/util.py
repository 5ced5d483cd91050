"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def small_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Create a small DataFrame without the slow Python-RDD fan-out.

    ``spark.createDataFrame(list, schema)`` parallelizes across
    defaultParallelism slices — 32 Python worker round-trips for a
    handful of rows (measured ~30 s for 2k rows in this env). Routing
    through one slice keeps it a single task; for flat schemas prefer
    ``spark.createDataFrame(pandas.DataFrame(...))`` (Arrow path).
    """
    sc = spark.sparkContext
    return spark.createDataFrame(sc.parallelize(rows, numSlices=1), schema)


def release_checkpoint(df: DataFrame) -> None:
    """Free the cached RDD behind a ``localCheckpoint``ed DataFrame.

    ``df.unpersist()`` only touches the SQL cache; a localCheckpoint is
    RDD-level storage. ``queryExecution().toRdd()`` on the checkpointed
    plan IS the stored RDD (unlike ``df.rdd``, which wraps it in a fresh
    deserializer), so unpersisting it releases the executor storage.
    Best-effort: failure means storage pressure, never wrong results.
    """
    try:
        df._jdf.queryExecution().toRdd().unpersist(False)
    except Exception:
        pass
