"""Temporal operators: batch sessionization + as-of join + tile pyramid."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from pbf_spark.operators.temporal import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    from pbf_spark.util import small_df

    return small_df(
        spark,
        [(i, T0 + dt.timedelta(seconds=s), u, k, float(v)) for i, s, u, k, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_sessionize_gap_splits_and_boundary(spark):
    # user 1: gap of exactly 1800 s does NOT split (> semantics); 1801 does
    ev = _events(
        spark,
        [
            (1, 0, 1, "c", 1.0),
            (2, 1800, 1, "c", 2.0),   # exactly the gap: same session
            (3, 3601, 1, "c", 4.0),   # 1801 s later: new session
            (4, 10, 2, "c", 8.0),     # other user: own session
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"], r["session_end"])
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert got[(1, 1)] == (2, 3.0, T0 + dt.timedelta(seconds=1800))
    assert got[(1, 2)] == (1, 4.0, T0 + dt.timedelta(seconds=3601))
    assert got[(2, 1)] == (1, 8.0, T0 + dt.timedelta(seconds=10))


def test_sessionize_order_invariant(spark):
    rows = [(i, s, 1, "c", 1.0) for i, s in [(1, 0), (2, 100), (3, 5000), (4, 5100)]]
    a = sessionize(_events(spark, rows)).collect()
    b = sessionize(_events(spark, rows[::-1])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 2


def test_asof_join_strict_and_ties(spark):
    ev = _events(
        spark,
        [
            (10, 0, 1, "view", 0.0),
            (11, 50, 1, "view", 0.0),
            (12, 50, 1, "view", 0.0),    # same ts as 11: higher id wins
            (20, 100, 1, "purchase", 9.0),
            (21, 100, 1, "purchase", 9.0),
            (30, 200, 2, "purchase", 9.0),  # user 2 has no view: dropped
            (31, 300, 3, "view", 0.0),
            (40, 300, 3, "purchase", 9.0),  # same-ts view must NOT match (strict)
        ],
    )
    purchases = ev.where("event_type='purchase'")
    views = ev.where("event_type='view'")
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_ts"])
        for r in asof_join(purchases, views).collect()
    }
    assert got[20] == (12, T0 + dt.timedelta(seconds=50))
    assert got[21] == (12, T0 + dt.timedelta(seconds=50))
    assert 30 not in got  # no prior view
    assert 40 not in got  # strict: same-ts view invisible

    # non-strict: the same-ts view matches
    got2 = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(purchases, views, strict=False).collect()
    }
    assert got2[40] == 31


def test_tile_pyramid_consistent_across_levels(spark):
    from pbf_spark.operators.tiles import tile_pyramid
    from pbf_spark.queries import event_points

    pts = event_points(spark, "/root/testdata/sf0.001")
    n = pts.count()
    pyr = tile_pyramid(pts, base_level=9, levels=(9, 7, 5)).collect()
    per_level = {}
    for r in pyr:
        per_level.setdefault(r["level"], 0)
        per_level[r["level"]] += r["n_points"]
    # every level partitions the same point set
    assert per_level == {9: n, 7: n, 5: n}
    # parent counts equal the sum of their children (bit-math ancestors)
    from pbf_spark.spatial import s2
    import numpy as np

    l9 = {r["tile_cell"]: r["n_points"] for r in pyr if r["level"] == 9}
    l7 = {r["tile_cell"]: r["n_points"] for r in pyr if r["level"] == 7}
    rolled = {}
    for cell, cnt in l9.items():
        parent = int(s2.parent_cell_id(np.array([cell], dtype=np.int64), 9, 7)[0])
        rolled[parent] = rolled.get(parent, 0) + cnt
    assert rolled == l7


def test_tile_pyramid_rejects_bad_levels(spark):
    from pbf_spark.operators.tiles import tile_pyramid
    from pbf_spark.queries import event_points

    with pytest.raises(ValueError, match="base_level"):
        tile_pyramid(event_points(spark, "/root/testdata/sf0.001"), base_level=9, levels=(9, 11))
