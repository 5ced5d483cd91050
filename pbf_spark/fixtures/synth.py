"""Deterministic synthetic corpora for throughput benches and tests.

The driver's ``documents``/``embeddings`` tables are tiny (500 rows at
sf0.01) — fine for correctness oracles, useless for measuring dedup/ANN
throughput. These generators build arbitrarily large corpora as pure
Catalyst expressions over ``spark.range`` (codegen, no Python, no
files), with PLANTED duplicate structure so recall is measurable:

- ``synth_docs(n)``: ids >= n-dup_tail are near-duplicates of
  ``id % (n - dup_tail)`` — same 20-word text with exactly one word
  replaced (jaccard ~0.7 on 3-shingles), plus the exact-dup tail that
  ``id % base`` induces naturally when n > 2*(n - dup_tail).
- ``synth_embeddings(n, dim)``: ids >= n-dup_tail are tiny
  perturbations of base vectors (cosine > 0.999), everything else is a
  deterministic pseudo-random direction.

Everything is a function of the row id only → identical across
partitionings, repeatable across sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 2000
WORDS_PER_DOC = 20


def synth_docs(spark: SparkSession, n: int, dup_tail: int | None = None) -> DataFrame:
    """→ (doc_id long, text string) with a planted near-dup tail."""
    dup_tail = dup_tail if dup_tail is not None else max(n // 20, 1)
    base = max(n - dup_tail, 1)  # n=1 (or dup_tail>=n) must not yield id % 0
    # word j of doc b: vocab index from a cheap integer mix (codegen-only)
    word = (
        f"concat('w', pmod(_b * 2654435761 + (i + 1) * 40503 + pmod(_b * (i + 7), 997), {VOCAB_SIZE}))"
    )
    return (
        spark.range(n)
        .withColumn("_b", F.expr(f"id % {base}"))
        .withColumn(
            "text",
            F.expr(
                f"""
                concat_ws(' ', transform(sequence(0, {WORDS_PER_DOC - 1}),
                  i -> IF(id >= {base} AND i = pmod(id, {WORDS_PER_DOC}),
                          concat('x', id), {word})))
                """
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )


def synth_embeddings(spark: SparkSession, n: int, dim: int = 64, dup_tail: int | None = None) -> DataFrame:
    """→ (vec_id long, embedding array<float>) with near-identical tail."""
    dup_tail = dup_tail if dup_tail is not None else max(n // 20, 1)
    base = max(n - dup_tail, 1)  # guard id % 0 for n=1 / dup_tail>=n
    return (
        spark.range(n)
        .withColumn("_b", F.expr(f"id % {base}"))
        .withColumn(
            "embedding",
            F.expr(
                f"""
                transform(sequence(1, {dim}),
                  i -> cast(sin(_b * i * 0.7182818) + cos(_b * 13.37 + i * i * 0.1)
                            + IF(id >= {base}, 0.001 * sin(id * i * 1.618), 0.0) AS float))
                """
            ),
        )
        .select(F.col("id").alias("vec_id"), "embedding")
    )
