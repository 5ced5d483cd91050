"""Role-aware multipolygon assembly from relations (operators/relations.py).

Fixture: one relation whose members rebuild the exact star/square/hole
multipolygon of the driver queries from split ways — multi-way outer
ring with a reversed segment, a role='' single closed way (old-style
default-outer), a two-way inner hole needing a reversal, an unclosed
chain that must be dropped and counted, a member referencing a missing
way, and a node member that must be ignored.
"""

import pytest
from pyspark.sql import functions as F

from pbf_spark.operators.relations import assemble_multipolygons
from pbf_spark.queries import POLYGON, POLYGON_HOLE, POLYGON_OUTER2
from pbf_spark.util import small_df

NODE_SCHEMA = "id long, lat double, lon double"
WAY_SCHEMA = "id long, refs array<long>"
REL_SCHEMA = "id long, members array<struct<ref:long,type:string,role:string>>"

UNCLOSED = [(51.40, -0.45), (51.45, -0.45), (51.45, -0.40)]


def _fixture(spark):
    nodes = []
    for base, ring in ((100, POLYGON), (200, POLYGON_OUTER2), (300, POLYGON_HOLE), (400, UNCLOSED)):
        nodes += [(base + i, la, lo) for i, (la, lo) in enumerate(ring)]
    nodes_df = small_df(spark, nodes, NODE_SCHEMA)
    ways = [
        (1, [100, 101, 102]),            # star v0→v2
        (2, [105, 104, 103, 102]),       # star v5→v2 (stored reversed)
        (3, [105, 106, 107, 100]),       # star v5→v0 (closes)
        (4, [200, 201, 202, 203, 200]),  # square, single closed way
        (5, [300, 301, 302]),            # hole half
        (6, [300, 303, 302]),            # hole half (needs reversal)
        (7, [400, 401]),                 # unclosed chain...
        (8, [401, 402]),                 # ...never returns to 400
    ]
    ways_df = small_df(spark, ways, WAY_SCHEMA)
    members = [
        (1, "way", "outer"),
        (2, "way", ""),        # '' defaults to outer
        (3, "way", "outer"),
        (4, "way", ""),
        (7, "way", "outer"),
        (8, "way", "outer"),
        (99, "way", "outer"),  # missing from ways table
        (100, "node", "admin_centre"),  # non-way member: ignored
        (5, "way", "inner"),
        (6, "way", "inner"),
    ]
    rel_df = small_df(spark, [(9, members)], REL_SCHEMA)
    return rel_df, ways_df, nodes_df


def test_assemble_multipolygon_rings_and_accounting(spark):
    rel_df, ways_df, nodes_df = _fixture(spark)
    out = assemble_multipolygons(rel_df, ways_df, nodes_df).collect()
    assert len(out) == 1
    row = out[0]
    assert row["polygon_id"] == "rel_9"
    assert row["n_rings"] == 3
    assert row["n_unclosed_rings"] == 1
    assert row["n_missing_ways"] == 1

    rings = [[(p["lat"], p["lon"]) for p in r] for r in row["rings"]]
    # ring order = stitch order: outer chains by member index, then inner
    assert rings[0] == POLYGON + [POLYGON[0]]            # reversed segment healed
    assert rings[1] == POLYGON_OUTER2 + [POLYGON_OUTER2[0]]
    assert rings[2] == POLYGON_HOLE + [POLYGON_HOLE[0]]  # inner, reversal healed
    # the unclosed chain's coordinates must appear nowhere
    flat = {pt for r in rings for pt in r}
    assert not flat & set(UNCLOSED)


def test_assembled_multipolygon_feeds_pip_join(spark):
    """The assembled rings drive build_polygon_index/point_in_polygon_join
    exactly like a hand-written multipolygon: hole excluded (even-odd),
    both outers included, unclosed chain contributes nothing."""
    from pbf_spark.operators.spatial import point_in_polygon_join

    rel_df, ways_df, nodes_df = _fixture(spark)
    polys = assemble_multipolygons(rel_df, ways_df, nodes_df).select("polygon_id", "rings")
    probes = small_df(
        spark,
        [
            (1, 51.50, -0.20),   # inside star body
            (2, 51.49, -0.13),   # inside the hole -> excluded
            (3, 51.38, 0.25),    # inside the second outer square
            (4, 51.43, -0.43),   # inside the UNCLOSED chain's would-be area
            (5, 51.30, 0.0),     # outside everything
        ],
        "id long, lat double, lon double",
    )
    got = {
        r["id"]
        for r in point_in_polygon_join(probes, polys, keep_polygon_cols=()).collect()
    }
    assert got == {1, 3}


def test_relation_with_only_unclosed_rings_yields_no_polygon(spark):
    nodes_df = small_df(spark, [(400 + i, la, lo) for i, (la, lo) in enumerate(UNCLOSED)], NODE_SCHEMA)
    ways_df = small_df(spark, [(7, [400, 401]), (8, [401, 402])], WAY_SCHEMA)
    rel_df = small_df(
        spark, [(5, [(7, "way", "outer"), (8, "way", "outer")])], REL_SCHEMA
    )
    assert assemble_multipolygons(rel_df, ways_df, nodes_df).count() == 0


def test_multipolygon_relation_filter(spark):
    from pbf_spark.operators.relations import multipolygon_relations

    ents = small_df(
        spark,
        [
            ("relation", 1, [("type", "multipolygon")]),
            ("relation", 2, [("type", "route")]),
            ("relation", 3, [("type", "boundary")]),
            ("way", 4, [("type", "multipolygon")]),
        ],
        "entity_type string, id long, tags array<struct<key:string,value:string>>",
    )
    assert {r["id"] for r in multipolygon_relations(ents).collect()} == {1, 3}


def test_ring_with_missing_nodes_is_demoted(spark):
    """Round-5 ADVICE: a ring whose member way lost nodes (clipped
    extract) closes on node IDS but its geometry is corrupt — it must
    be excluded from ``rings`` and counted, not silently emitted."""
    from pbf_spark.operators.relations import assemble_multipolygons
    from pbf_spark.util import small_df

    sq1 = [(51.0, 0.0), (51.0, 0.1), (51.1, 0.1), (51.1, 0.0)]
    sq2 = [(52.0, 0.0), (52.0, 0.1), (52.1, 0.1), (52.1, 0.0)]
    nodes = [(10 + i, la, lo) for i, (la, lo) in enumerate(sq1)]
    # square 2's node 22 is MISSING from the node table
    nodes += [(20 + i, la, lo) for i, (la, lo) in enumerate(sq2) if i != 2]
    nodes_df = small_df(spark, nodes, "id long, lat double, lon double")
    ways_df = small_df(
        spark,
        [(1, [10, 11, 12, 13, 10]), (2, [20, 21, 22, 23, 20])],
        "id long, refs array<long>",
    )
    rel_df = small_df(
        spark,
        [(5, [(1, "way", "outer"), (2, "way", "outer")])],
        "id long, members array<struct<ref:long,type:string,role:string>>",
    )
    (row,) = assemble_multipolygons(rel_df, ways_df, nodes_df).collect()
    assert row["n_rings"] == 1                  # only the intact square
    assert row["n_node_missing_rings"] == 1     # the clipped one, demoted
    assert row["n_unclosed_rings"] == 0
    got = {(p["lat"], p["lon"]) for p in row["rings"][0]}
    assert got == set(sq1)                      # clipped ring's points absent
