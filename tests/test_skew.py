"""Skew-handling operator tests (B8): salted results == plain results."""

import pyspark.sql.functions as F
import pytest

from pbf_spark.operators import skew, spatial


@pytest.fixture(scope="module")
def skewed_cells(spark, fixture_dir):
    """Cell-keyed node frame — the fixture plants zipf-hot clusters, so a
    handful of cells dominate (the urban-density skew the rule targets)."""
    from pbf_spark.operators import decode
    from pbf_spark.sources import iceberg_lite

    docs = iceberg_lite.read_table(spark, fixture_dir / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, fixture_dir / "media_blobs")
    nodes = (
        decode.decode_documents(docs, blobs, columns=frozenset())
        .where("entity_type='node'")
        .select("id", "lat", "lon")
    )
    df = spatial.with_cells(nodes, s2_level=10, hex_res=7).cache()
    df.count()
    return df


def test_fixture_is_actually_skewed(skewed_cells):
    counts = skewed_cells.groupBy("s2_cell").count()
    stats = counts.agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).first()
    assert stats["mx"] > 10 * stats["avg"]  # hot cells exist by construction


def test_salted_agg_matches_plain(skewed_cells):
    plain = (
        skewed_cells.groupBy("s2_cell")
        .agg(F.count("*").alias("n"), F.min("id").alias("min_id"), F.max("lat").alias("max_lat"))
        .orderBy("s2_cell")
        .collect()
    )
    salted = (
        skew.salted_agg(
            skewed_cells,
            keys=["s2_cell"],
            agg_cols={"n": "count", "min_id": "min:id", "max_lat": "max:lat"},
            n_salts=16,
            deterministic_col="id",
        )
        .orderBy("s2_cell")
        .collect()
    )
    assert plain == salted


def test_salted_join_matches_plain(spark, skewed_cells):
    import pandas as pd

    top = skewed_cells.groupBy("s2_cell").count().orderBy(F.desc("count")).limit(10).collect()
    dim = spark.createDataFrame(
        pd.DataFrame({"s2_cell": [r["s2_cell"] for r in top], "label": [f"hot_{i}" for i in range(len(top))]})
    )
    plain = skewed_cells.join(dim, "s2_cell").groupBy("label").count().orderBy("label").collect()
    salted = (
        skew.salted_join(skewed_cells, dim, on=["s2_cell"], n_salts=8, deterministic_col="id")
        .groupBy("label")
        .count()
        .orderBy("label")
        .collect()
    )
    assert plain == salted
