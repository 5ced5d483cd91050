"""Round-trip semantic-equality test (reference §5.3 analogue).

decode → re-encode (write_pbf) → re-decode; equality of per-type counts
and an order-insensitive multiset digest over canonicalized entities
(tags key-sorted inside the digest — decode emits wire order; 1 cm-grid coords =
lat_nano; second-truncated timestamps), mirroring
/root/reference/roundtrip_integration_test.go:204-309.
"""

import pyspark.sql.functions as F
import pytest

from pbf_spark.operators import decode
from pbf_spark.sources import iceberg_lite, pbf_file, pbf_sink


def canonical_digest(entities):
    """Order-insensitive multiset digest: sum of per-entity sha2 prefixes.

    decimal(38) sum dodges ANSI overflow while keeping collisions
    negligible (120-bit space, sum commutative → partition-order-proof).
    """
    canon = F.concat_ws(
        "|",
        F.col("entity_type"),
        F.col("id"),
        F.coalesce(F.col("lat_nano").cast("string"), F.lit("")),
        F.coalesce(F.col("lon_nano").cast("string"), F.lit("")),
        F.coalesce(F.to_json(F.array_sort("tags")), F.lit("[]")),  # tags are wire-order; canonicalize here
        F.coalesce(F.to_json("refs"), F.lit("[]")),
        F.coalesce(F.to_json("members"), F.lit("[]")),
        F.coalesce(F.col("info.version").cast("string"), F.lit("")),
        F.coalesce(F.col("info.uid").cast("string"), F.lit("")),
        F.coalesce(F.unix_timestamp("info.ts").cast("string"), F.lit("")),  # second-truncated
        F.coalesce(F.col("info.changeset").cast("string"), F.lit("")),
        F.coalesce(F.col("info.user"), F.lit("")),
        F.coalesce(F.col("info.visible").cast("string"), F.lit("true")),
    )
    return (
        F.sum(F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("decimal(38,0)"))
    )


@pytest.fixture(scope="module")
def entities(spark, fixture_dir):
    docs = iceberg_lite.read_table(spark, fixture_dir / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, fixture_dir / "media_blobs")
    df = decode.decode_documents(docs, blobs).cache()
    df.count()
    return df


def test_roundtrip_digest(spark, entities, fixture_manifest, tmp_path_factory):
    out = tmp_path_factory.mktemp("rt") / "roundtrip.osm.pbf"
    stats = pbf_sink.write_pbf(entities, out)
    assert stats["n_entities"] == fixture_manifest["total_entities"]

    redecoded = decode.decode_blobs(pbf_file.read_blob_table(spark, out))
    counts1 = {r["entity_type"]: r["n"] for r in decode.count_by_type(entities).collect()}
    counts2 = {r["entity_type"]: r["n"] for r in decode.count_by_type(redecoded).collect()}
    assert counts1 == counts2 == fixture_manifest["counts"]

    d1 = entities.agg(canonical_digest(entities).alias("d")).first()["d"]
    d2 = redecoded.agg(canonical_digest(redecoded).alias("d")).first()["d"]
    assert d1 == d2

    # header carries the aggregated bbox + HistoricalInformation (fixture
    # contains visible=false rows)
    hdr = pbf_file.load_header(out)
    assert "HistoricalInformation" in hdr.required_features
    bb = hdr.bbox_degrees
    # aggregated data bbox lies within the generator bbox
    assert bb["bottom"] >= fixture_manifest["bbox"]["bottom"] - 1e-6
    assert bb["top"] <= fixture_manifest["bbox"]["top"] + 1e-6
    assert bb["left"] >= fixture_manifest["bbox"]["left"] - 1e-6


def test_roundtrip_sample_pbf(spark, tmp_path_factory):
    """Reference fixture round trip: sample.osm.pbf → entities → PBF →
    entities; digests equal (the reference's own test shape)."""
    from .conftest import SAMPLE_PBF

    ents = decode.decode_blobs(pbf_file.read_blob_table(spark, SAMPLE_PBF)).cache()
    out = tmp_path_factory.mktemp("rt2") / "sample-rt.osm.pbf"
    stats = pbf_sink.write_pbf(ents, out)
    assert stats["n_entities"] == 339
    red = decode.decode_blobs(pbf_file.read_blob_table(spark, out))
    d1 = ents.agg(canonical_digest(ents).alias("d")).first()["d"]
    d2 = red.agg(canonical_digest(red).alias("d")).first()["d"]
    assert d1 == d2


def test_roundtrip_locations_on_ways_file(spark, tmp_path_factory):
    """File-level LocationsOnWays round trip: decode (opt-in columns) →
    write_pbf (re-emits fields 9/10 + declares the optional feature) →
    decode again, way coordinates bit-exact."""
    from pbf_spark.model.schema import MEDIA_BLOB_SCHEMA
    from pbf_spark.util import small_df
    from pbf_spark.wire.osmformat import (
        StringTable,
        build_dense_nodes_group,
        build_primitive_block,
        build_ways_group,
    )
    import numpy as np

    st = StringTable()
    st.add("")
    table, sid = st.build()
    # granularity-100 representable (the default wire precision is 1e-7 deg)
    lats = [51_500_000_000, 51_500_001_000, 51_499_999_100]
    lons = [-100_000_000, -99_999_000, -99_998_400]
    nodes_g = build_dense_nodes_group(
        np.array([10, 25, 30]), np.array(lats, np.int64), np.array(lons, np.int64), None, sid
    )
    ways_g = build_ways_group(
        [dict(id=7, refs=[10, 25, 30], lat_nanos=lats, lon_nanos=lons)], sid
    )
    raw = build_primitive_block([nodes_g, ways_g], table)
    blob_df = small_df(
        spark, [("m0", 0, "OSMData", "raw", len(raw), bytearray(raw))], MEDIA_BLOB_SCHEMA
    )
    ents = decode.decode_blobs(blob_df, way_locations=True)

    out = tmp_path_factory.mktemp("rtlow") / "low.osm.pbf"
    pbf_sink.write_pbf(ents, out)
    hdr = pbf_file.load_header(out)
    assert "LocationsOnWays" in hdr.optional_features

    red = decode.decode_blobs(pbf_file.read_blob_table(spark, out), way_locations=True)
    row = red.where("entity_type='way'").collect()[0]
    first = ents.where("entity_type='way'").collect()[0]
    # bit-exact vs the first decode (to_degrees is nano * 1e-9, so the
    # doubles are NOT v/1e9 to the last ulp — compare decode-vs-redecode)
    assert row["way_lats"] == first["way_lats"]
    assert row["way_lons"] == first["way_lons"]
    assert [round(v * 1e9) for v in row["way_lats"]] == lats
    assert [round(v * 1e9) for v in row["way_lons"]] == lons

    # a file without way locations must NOT declare the feature
    out2 = tmp_path_factory.mktemp("rtlow") / "plain.osm.pbf"
    pbf_sink.write_pbf(decode.decode_blobs(blob_df), out2)
    assert "LocationsOnWays" not in pbf_file.load_header(out2).optional_features


def test_write_pbf_rejects_mixed_locations_on_ways(spark, tmp_path_factory):
    """LocationsOnWays is all-or-nothing per file (ADVICE r4): mixed
    presence would write a file our own decoder rejects, so write_pbf
    must fail eagerly with a clear error."""
    from pbf_spark.model.schema import MEDIA_BLOB_SCHEMA
    from pbf_spark.util import small_df
    from pbf_spark.wire.osmformat import (
        StringTable,
        build_dense_nodes_group,
        build_primitive_block,
        build_ways_group,
    )
    import numpy as np

    st = StringTable()
    st.add("")
    table, sid = st.build()
    lats = [51_500_000_000, 51_500_001_000]
    lons = [-100_000_000, -99_999_000]
    nodes_g = build_dense_nodes_group(
        np.array([10, 25]), np.array(lats, np.int64), np.array(lons, np.int64), None, sid
    )
    with_locs = build_primitive_block(
        [build_ways_group([dict(id=7, refs=[10, 25], lat_nanos=lats, lon_nanos=lons)], sid)],
        table,
    )
    without_locs = build_primitive_block(
        [build_ways_group([dict(id=8, refs=[25, 10])], sid)], table
    )
    nodes_blk = build_primitive_block([nodes_g], table)
    blob_df = small_df(
        spark,
        [
            ("m0", 0, "OSMData", "raw", len(nodes_blk), bytearray(nodes_blk)),
            ("m1", 1, "OSMData", "raw", len(with_locs), bytearray(with_locs)),
            ("m2", 2, "OSMData", "raw", len(without_locs), bytearray(without_locs)),
        ],
        MEDIA_BLOB_SCHEMA,
    )
    ents = decode.decode_blobs(blob_df, way_locations=True)
    with pytest.raises(ValueError, match="LocationsOnWays presence is mixed"):
        pbf_sink.write_pbf(ents, tmp_path_factory.mktemp("rtmix") / "mixed.osm.pbf")
