"""Deterministic hash sampling/splitting (operators/sample.py): the
properties training pipelines actually rely on — stability under
repartitioning, per-key split exclusivity, salt independence."""

import pyspark.sql.functions as F
import pytest

from pbf_spark.operators.sample import hash_bucket, hash_sample, hash_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.range(5000).select(F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"))
    df = df.cache()
    df.count()
    return df


def test_split_partition_invariant(spark, docs):
    """The same key lands in the same split regardless of layout — the
    property df.sample(seed=) does NOT have."""
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", FR).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17), "doc_id", FR).collect()
    }
    assert a == b


def test_split_covers_and_roughly_proportional(spark, docs):
    counts = dict(
        hash_split(docs, "doc_id", FR)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_sample_is_split_prefix(spark, docs):
    """hash_sample(f) is exactly the first f of the bucket space, so a
    10% sample is a SUBSET of the 20% sample (nested samples — lets a
    pipeline grow its sample without resampling old members)."""
    s10 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.10).collect()}
    s20 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.20).collect()}
    assert s10 < s20
    assert abs(len(s10) / 5000 - 0.10) < 0.02


def test_salt_re_rolls(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, salt="v2").collect()}
    overlap = len(a & b) / 5000
    assert 0.15 < overlap < 0.35  # ~25% = independent re-roll


def test_bucket_uniformity(spark, docs):
    # chi-square-ish sanity over 10 coarse bins
    bins = (
        docs.select((hash_bucket(F.col("doc_id")) / 100000).cast("int").alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = {r["b"]: r["count"] for r in bins}
    assert set(counts) == set(range(10))
    assert all(abs(c - 500) < 120 for c in counts.values()), counts


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_single_split_degenerate(spark, docs):
    rows = hash_split(docs, "doc_id", {"all": 1.0}).select("split").distinct().collect()
    assert [r["split"] for r in rows] == ["all"]
