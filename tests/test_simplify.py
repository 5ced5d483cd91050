"""Douglas-Peucker way simplification (operators/ways.simplify_ways):
geometric contracts (not implementation echoes) — endpoint survival,
the tolerance bound on removed vertices, straight-line collapse,
above-tolerance preservation, and the degenerate closed-ring anchor."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from pbf_spark.operators.ways import _dp_mask, simplify_ways

M_LAT = 111194.9266


def _dev_m(lats, lons, keep):
    """Max distance (projected meters) of any DROPPED point from the
    kept polyline — the quantity DP promises to bound."""
    kx = M_LAT * np.cos(np.radians(np.mean(lats)))
    xs, ys = np.asarray(lons) * kx, np.asarray(lats) * M_LAT
    kept = np.flatnonzero(keep)
    worst = 0.0
    for p in np.flatnonzero(~np.asarray(keep)):
        seg = np.searchsorted(kept, p) - 1
        i, j = kept[seg], kept[seg + 1]
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        seg2 = dx * dx + dy * dy
        px, py = xs[p] - xs[i], ys[p] - ys[i]
        if seg2 == 0:
            d = np.hypot(px, py)
        else:  # distance to the infinite anchor line — what DP bounds
            d = abs(px * dy - py * dx) / np.sqrt(seg2)
        worst = max(worst, float(d))
    return worst


def _rand_way(rng, n):
    lat0, lon0 = 51.5 + rng.uniform(-1, 1), -0.1 + rng.uniform(-1, 1)
    return (
        lat0 + np.cumsum(rng.uniform(-1e-4, 1e-4, n)),
        lon0 + np.cumsum(rng.uniform(-1e-4, 1e-4, n)),
    )


def test_mask_contracts_random_ways():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(3, 200))
        lats, lons = _rand_way(rng, n)
        tol = float(rng.uniform(0.5, 30.0))
        keep = _dp_mask(lats, lons, tol)
        assert keep[0] and keep[-1]
        # anchored-line DP bounds segment deviation by tol
        assert _dev_m(lats, lons, keep) <= tol + 1e-9


def test_straight_line_collapses():
    lats = np.linspace(51.0, 51.01, 50)
    lons = np.linspace(0.0, 0.02, 50)
    assert _dp_mask(lats, lons, 0.5).sum() == 2


def test_above_tolerance_keeps_every_vertex():
    # ~111 m amplitude zigzag, 1 m tolerance: nothing is removable
    lats = 51.0 + np.array([0, 1e-3, 0, 1e-3, 0, 1e-3])
    lons = np.linspace(0, 5e-3, 6)
    assert _dp_mask(lats, lons, 1.0).all()


def test_closed_ring_anchor_degenerate():
    # first == last: the seg2 == 0 plain-distance branch
    lats = np.array([51.0, 51.001, 51.001, 51.0, 51.0])
    lons = np.array([0.0, 0.0, 0.001, 0.001, 0.0])
    keep = _dp_mask(lats, lons, 0.5)
    assert keep[0] and keep[-1] and keep.sum() >= 3


def test_spark_udf_matches_mask_and_passes_short_ways(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        n = int(rng.integers(2, 120))
        la, lo = _rand_way(rng, n)
        rows.append((i, la.tolist(), lo.tolist()))
    rows.append((99, None, None))
    df = spark.createDataFrame(rows, "id long, way_lats array<double>, way_lons array<double>")
    got = {
        r["id"]: (r["way_lats"], r["way_lons"])
        for r in simplify_ways(df, tolerance_m=5.0).collect()
    }
    for i, la, lo in rows:
        if la is None:
            assert got[i] == (None, None)
        elif len(la) < 3:
            assert got[i][0] == pytest.approx(la)
        else:
            m = _dp_mask(np.array(la), np.array(lo), 5.0)
            assert got[i][0] == pytest.approx(np.array(la)[m].tolist())
            assert got[i][1] == pytest.approx(np.array(lo)[m].tolist())
