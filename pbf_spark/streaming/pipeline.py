"""Structured-Streaming decode with checkpoint/resume (SURVEY.md §2B B9).

The interleaved document table is consumed as a file stream
(``readStream.parquet`` over the Iceberg-lite data dir with
``availableNow``), joined stream-static against the media-blob sidecar,
decoded by the same mapInArrow operator as the batch path, and written
to a parquet sink with a ``checkpointLocation``.

Resumability contract (north rule): the checkpoint records which input
files each micro-batch committed; killing the query (or the process)
and restarting with the same checkpoint resumes EXACTLY after the last
committed batch — already-processed documents are never decoded twice,
newly arrived document files are picked up. Per-batch lineage rows are
appended from ``foreachBatch`` so every partition's decode is traceable
and re-derivable (lineage.py).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..lineage import append_lineage
from ..model.schema import DOCUMENT_SCHEMA
from ..operators.decode import decode_documents


def stream_decode_documents(
    spark: SparkSession,
    docs_table_dir: str | Path,
    media_blobs: DataFrame,
    output_dir: str | Path,
    checkpoint_dir: str | Path,
    lineage_dir: str | Path | None = None,
    run_id: str = "stream",
    partitions: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Run one availableNow streaming pass; returns the finished query.

    ``docs_table_dir``: the Iceberg-lite table dir (data/ holds parquet
    files; the file-stream source tracks files, which matches the
    append-only commit discipline).
    """
    reader = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs_stream = reader.parquet(str(Path(docs_table_dir) / "data"))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        entities = decode_documents(batch_df, media_blobs, partitions=partitions)
        entities.persist()
        try:
            entities.write.mode("append").parquet(str(output_dir))
            if lineage_dir is not None:
                append_lineage(entities, run_id, lineage_dir, batch_id)
        finally:
            entities.unpersist()

    query = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_windowed_event_counts(
    spark: SparkSession,
    events_dir: str | Path,
    output_dir: str | Path,
    checkpoint_dir: str | Path,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    schema=None,
):
    """Watermarked windowed aggregation over an event file stream (the
    late-data contract): counts + value sums per (event-time window,
    event_type), append-mode so a window only emits once its watermark
    passes — rows later than ``watermark`` behind the max seen event
    time are dropped by construction, bounding state at 100-TB stream
    scale. availableNow + checkpoint make the aggregation resumable
    exactly like the decode stream; run again after new files arrive
    and only unemitted/updated windows append.
    """
    from pyspark.sql import functions as F

    if schema is None:
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(events_dir))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    query = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(output_dir))
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
