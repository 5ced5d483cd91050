"""Vectorized spherical/planar geometry primitives (numpy).

All from public formulas (haversine; even-odd ray casting). These run
inside Arrow-batched pandas UDFs — never per-row Python.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean earth radius (IUGG)


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters (degrees in, vectorized)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def latlon_to_unit_xyz(lat: np.ndarray, lon: np.ndarray):
    """Degrees → unit sphere vectors."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def unit_xyz_to_latlon(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Unit sphere vectors → degrees."""
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def points_in_ring(lat: np.ndarray, lon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast point-in-polygon, vectorized over points.

    ``ring``: (m, 2) array of (lat, lon) vertices, closed or open (the
    wrap edge is implied). Planar in lon/lat space — exact for the
    city-scale polygons this engine joins (documented contract; the
    DuckDB oracle uses the identical rule so the join is verifiable).
    Points exactly on a horizontal-crossing boundary follow the
    half-open rule (consistent, no double counting across shared edges).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] > 1 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    ry, rx = ring[:, 0], ring[:, 1]  # y = lat, x = lon
    y = np.asarray(lat, dtype=np.float64)[:, None]
    x = np.asarray(lon, dtype=np.float64)[:, None]
    y1, x1 = ry[None, :], rx[None, :]
    y2, x2 = np.roll(ry, -1)[None, :], np.roll(rx, -1)[None, :]
    crosses = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at_y = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    hit = crosses & (x < x_at_y)
    return hit.sum(axis=1) % 2 == 1


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max)."""
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].min()),
        float(ring[:, 1].max()),
    )
