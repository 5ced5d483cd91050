"""Spark-level spatial operator tests against slow exact numpy oracles.

Per FIXTURES.md §3: expected outputs come from O(n·m) exhaustive oracles
computed in the test, never from the engine under test.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from pbf_spark.operators import decode, knn, spatial, tiles
from pbf_spark.sources import iceberg_lite
from pbf_spark.spatial import geometry


@pytest.fixture(scope="module")
def nodes(spark, fixture_dir):
    docs = iceberg_lite.read_table(spark, fixture_dir / "documents_interleaved")
    blobs = iceberg_lite.read_table(spark, fixture_dir / "media_blobs")
    df = (
        decode.decode_documents(docs, blobs)
        .filter("entity_type='node'")
        .select("id", "lat", "lon", "lat_nano", "lon_nano")
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def nodes_np(nodes):
    pdf = nodes.toPandas().sort_values("id")
    return (
        pdf["id"].to_numpy(np.int64),
        pdf["lat"].to_numpy(np.float64),
        pdf["lon"].to_numpy(np.float64),
    )


def test_with_cells_deterministic(nodes):
    a = spatial.with_cells(nodes).select("id", "s2_cell", "hex_cell")
    b = spatial.with_cells(nodes.repartition(13)).select("id", "s2_cell", "hex_cell")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert a.filter("s2_cell is null or hex_cell is null").count() == 0


def test_pip_join_matches_exhaustive_oracle(spark, fixture_dir, nodes, nodes_np):
    polys = spark.read.parquet(str(fixture_dir / "polygons.parquet"))
    got = (
        spatial.point_in_polygon_join(nodes, polys)
        .select("polygon_id", "id")
        .toPandas()
    )
    got_pairs = set(map(tuple, got.itertuples(index=False)))

    ids, lat, lon = nodes_np
    expected = set()
    for prow in polys.collect():
        ring = np.array([[p["lat"], p["lon"]] for p in prow["ring"]])
        inside = geometry.points_in_ring(lat, lon, ring)
        expected.update((prow["polygon_id"], int(i)) for i in ids[inside])
    assert got_pairs == expected
    assert len(expected) > 100  # fixture sanity: polygons actually cover nodes


def test_pip_join_auto_level_identical_results(spark, fixture_dir, nodes):
    """level=None (data-driven per-polygon prefilter) must produce the
    SAME join rows as the manual level-13 config — the level is purely a
    perf knob (covering is always a superset prefilter)."""
    polys = spark.read.parquet(str(fixture_dir / "polygons.parquet"))
    index = spatial.build_polygon_index(spark, polys, level=None)
    auto = (
        spatial.point_in_polygon_join(nodes, index, level=None)
        .select("polygon_id", "id")
    )
    manual = (
        spatial.point_in_polygon_join(nodes, polys, level=13)
        .select("polygon_id", "id")
    )
    assert auto.exceptAll(manual).isEmpty() and manual.exceptAll(auto).isEmpty()


def test_pip_join_holes_matches_exhaustive_oracle(spark, nodes, nodes_np):
    """Multi-ring polygon (outer + hole): engine join must equal the
    exhaustive even-odd oracle over the concatenated edges — points
    inside the hole excluded, hole-aware covering never misclassifies."""
    from pbf_spark.util import small_df

    # ring vertex counts intentionally DIFFER (5 vs 4): Spark's
    # arrow→pandas path chokes on inhomogeneous array<array<struct>>,
    # which is why the covering runs via mapInArrow
    outer = [(51.30, -0.40), (51.30, 0.20), (51.70, 0.20), (51.72, -0.10), (51.70, -0.40)]
    hole = [(51.40, -0.25), (51.55, -0.25), (51.55, -0.05), (51.40, -0.05)]
    poly = small_df(
        spark,
        [(
            "holed",
            [
                [{"lat": la, "lon": lo} for la, lo in outer],
                [{"lat": la, "lon": lo} for la, lo in hole],
            ],
            "test",
        )],
        "polygon_id string, rings array<array<struct<lat:double,lon:double>>>, category string",
    )
    got = (
        spatial.point_in_polygon_join(nodes, poly, keep_polygon_cols=())
        .select("polygon_id", "id")
        .toPandas()
    )
    got_pairs = set(map(tuple, got.itertuples(index=False)))
    ids, lat, lon = nodes_np
    inside = geometry.points_in_ring(lat, lon, np.array(outer)) ^ geometry.points_in_ring(
        lat, lon, np.array(hole)
    )
    in_hole = geometry.points_in_ring(lat, lon, np.array(hole))
    expected = {("holed", int(i)) for i in ids[inside]}
    assert got_pairs == expected
    assert in_hole.sum() > 50  # fixture sanity: the hole actually excludes nodes
    assert not any(("holed", int(i)) in got_pairs for i in ids[in_hole])


def test_knn_matches_exhaustive_oracle(spark, fixture_dir, nodes, nodes_np):
    queries = spark.read.parquet(str(fixture_dir / "query_points.parquet")).limit(60)
    k = 5
    got = knn.knn_join(nodes, queries, k=k).toPandas()
    ids, lat, lon = nodes_np

    for qrow in queries.collect():
        d = geometry.haversine_m(np.full(len(lat), qrow["lat"]), np.full(len(lon), qrow["lon"]), lat, lon)
        order = np.lexsort((ids, d))[:k]
        expect_ids = list(ids[order])
        sub = got[got.query_id == qrow["query_id"]].sort_values("rank")
        assert list(sub["id"]) == expect_ids, f"query {qrow['query_id']}"
        np.testing.assert_allclose(sub["dist_m"].to_numpy(), d[order], rtol=1e-9)


def test_knn_exactly_k_rows_per_query(spark, fixture_dir, nodes):
    queries = spark.read.parquet(str(fixture_dir / "query_points.parquet")).limit(60)
    got = knn.knn_join(nodes, queries, k=5)
    counts = got.groupBy("query_id").count()
    assert counts.filter("count != 5").count() == 0
    assert counts.count() == 60


def test_tiles_partition_invariant(nodes):
    t1 = tiles.materialize_tiles(nodes, tile_level=10, raster_bits=5)
    t2 = tiles.materialize_tiles(nodes.repartition(17), tile_level=10, raster_bits=5)
    p1 = t1.orderBy("tile_cell").toPandas()
    p2 = t2.orderBy("tile_cell").toPandas()
    assert list(p1["tile_cell"]) == list(p2["tile_cell"])
    for a, b in zip(p1["raster"], p2["raster"]):
        assert list(a) == list(b)
    # conservation: every node lands in exactly one bin
    assert int(p1["n_points"].sum()) == nodes.count()


def test_tiles_match_oracle_binning(nodes, nodes_np):
    from pbf_spark.spatial import s2 as s2m

    t = tiles.materialize_tiles(nodes, tile_level=10, raster_bits=5).toPandas()
    ids, lat, lon = nodes_np
    fine = s2m.lat_lon_to_cell_id(lat, lon, 15)
    shift = 2 * (s2m.MAX_LEVEL - 15) + 1
    pos = (fine.astype(np.uint64) >> np.uint64(shift)).astype(np.int64)
    bins = pos & 1023
    tile_pos = pos >> 10
    tile_ids = (tile_pos << np.int64(2 * (s2m.MAX_LEVEL - 10) + 1)) + (
        1 << (2 * (s2m.MAX_LEVEL - 10))
    )
    for tile in np.unique(tile_ids)[:20]:
        m = tile_ids == tile
        oracle = np.zeros(1024, dtype=np.int64)
        np.add.at(oracle, bins[m], 1)
        row = t[t.tile_cell == tile]
        assert len(row) == 1
        assert list(row.iloc[0]["raster"]) == oracle.tolist()


def test_raster_to_vector_roundtrip(nodes):
    t = tiles.materialize_tiles(nodes, tile_level=10, raster_bits=5)
    v = tiles.raster_to_vector(t, tile_level=10, raster_bits=5)
    # total count preserved, every vector point re-indexes into its own tile
    assert v.agg(F.sum("n")).first()[0] == nodes.count()
    back = spatial.with_cells(v, s2_level=10).filter(F.col("s2_cell") != F.col("tile_cell"))
    assert back.count() == 0


def test_knn_exact_at_icosahedron_seams(spark):
    """Brute-force parity with query points ON icosahedron edges and a
    point cloud straddling the seams (ADVICE round-1: k-ring coverage at
    face boundaries). Seam padding + the provable gnomonic margin must
    keep the neighbor sets exact."""
    from pbf_spark.spatial import hexgrid
    from pbf_spark.spatial.geometry import haversine_m, unit_xyz_to_latlon

    rng = np.random.default_rng(99)
    # midpoints of the first 6 icosahedron edges = exact seam points
    seams = []
    for a, b, c in hexgrid._FACES[:6]:
        m = (hexgrid._VERTS[a] + hexgrid._VERTS[b]) / 2.0
        m = m / np.linalg.norm(m)
        seams.append(unit_xyz_to_latlon(m[0], m[1], m[2]))
    q_lat = np.array([s[0] for s in seams], dtype=np.float64)
    q_lon = np.array([s[1] for s in seams], dtype=np.float64)
    # cloud: 400 points within ~3 km of each seam point (res-9 cells ~350m)
    p_lat = np.repeat(q_lat, 400) + rng.uniform(-0.03, 0.03, 2400)
    p_lon = np.repeat(q_lon, 400) + rng.uniform(-0.03, 0.03, 2400)
    pts = spark.createDataFrame(
        __import__("pandas").DataFrame(
            {"id": np.arange(2400), "lat": p_lat, "lon": p_lon}
        )
    )
    queries = spark.createDataFrame(
        __import__("pandas").DataFrame(
            {"query_id": np.arange(len(seams)), "lat": q_lat, "lon": q_lon}
        )
    )
    got = knn.knn_join(pts, queries, k=5).toPandas().sort_values(["query_id", "rank"])
    for qi in range(len(seams)):
        d = haversine_m(q_lat[qi], q_lon[qi], p_lat, p_lon)
        order = np.lexsort((np.arange(2400), d))[:5]
        expected = list(np.arange(2400)[order])
        assert list(got[got["query_id"] == qi]["id"]) == expected, f"query {qi}"
