"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the baseline. Pure column
  expressions (zip_with dot product) so the DuckDB oracle can reproduce
  values bit-closely (both round to 6 dp before ranking/hashing).
  Queries are broadcast; the big side streams through one codegen stage
  and one per-query window rank.
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets
  computed by a vectorized numpy pandas UDF, candidates by bucket
  equi-join (optionally multi-probe), exact re-rank inside buckets.
  Recall < 1 by construction; the test suite measures recall against
  the brute-force baseline instead of asserting equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: → (q_id, vec_id, cosine, rank), rank 1..k.

    Deterministic: rank by (rounded cosine desc, vec_id asc); self-matches
    are not excluded (callers filter if needed).
    """
    joined = embeddings.crossJoin(F.broadcast(queries))
    cos = _dot(F.col(vec_col), F.col(query_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        joined.select(F.col(query_id_col), F.col(id_col), F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _bucket_udf(planes: np.ndarray):
    bc_planes = planes

    @pandas_udf(T.IntegerType())
    def _udf(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())  # (n, dim) float32
        signs = (m.astype(np.float64) @ bc_planes.T) > 0  # (n, n_planes)
        out = np.zeros(len(vec), dtype=np.int32)
        for b in range(bc_planes.shape[0]):
            out |= signs[:, b].astype(np.int32) << b
        return pd.Series(out)

    return _udf


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k with sign-LSH buckets.

    ``multiprobe`` ≥ 1 additionally probes buckets at Hamming distance 1
    from the query bucket (flipping each of the n_planes bits), trading
    compute for recall.
    """
    planes = np.random.default_rng(seed).normal(size=(n_planes, dim))
    bucket = _bucket_udf(planes)

    emb_b = embeddings.withColumn("_bucket", bucket(F.col(vec_col)))
    q_b = queries.withColumn("_b0", bucket(F.col(query_vec_col)))
    if multiprobe > 0:
        probes = F.array(
            F.col("_b0"),
            *[F.col("_b0").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)],
        )
    else:
        probes = F.array(F.col("_b0"))
    q_b = q_b.withColumn("_bucket", F.explode(probes))

    cand = emb_b.join(F.broadcast(q_b.drop("_b0")), "_bucket")
    cos = _dot(F.col(vec_col), F.col(query_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        cand.select(F.col(query_id_col), F.col(id_col), F.round(cos, 6).alias("cosine"))
        .dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_dedup(
    embeddings: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same sign-LSH buckets:
    → (id_a, id_b, cosine) with cosine ≥ threshold, id_a < id_b."""
    planes = np.random.default_rng(seed).normal(size=(n_planes, embeddingsdim(embeddings, vec_col)))
    bucket = _bucket_udf(planes)
    b = embeddings.withColumn("_bucket", bucket(F.col(vec_col)))
    a_side = b.select(
        F.col("_bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b_side = b.select(
        F.col("_bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    pairs = a_side.join(b_side, "_bucket").where(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def embeddingsdim(embeddings: DataFrame, vec_col: str) -> int:
    return len(embeddings.select(vec_col).first()[0])
