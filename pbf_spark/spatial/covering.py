"""Adaptive hierarchical S2 polygon covering (the S2RegionCoverer shape).

Replaces the round-1 quarter-cell bbox meshgrid — which was
O(bbox_area / cell_area) and driver-side — with a multi-level BFS that
emits COARSE cells for the polygon interior and fine cells only along
the boundary, so a country-sized polygon covers in thousands of cells
instead of millions, and the whole computation is per-polygon numpy that
runs distributed inside ``applyInPandas`` (operators/spatial.py); only
the resulting covering (small) is broadcast.

Cell classification is conservative on purpose (correct superset):
- a cell's region is bounded by the inflated lat/lon bbox of its 4
  corners (5% angular inflation dominates the gnomonic/quadratic edge
  curvature, which is O(theta^2/8) ~ 0.1%);
- DISJOINT (dropped) only when no ring vertex lies in the cell bbox, no
  cell-bbox corner is inside the ring, and no ring-edge bbox overlaps
  the cell bbox — then the cell provably contains no boundary or
  interior point;
- INTERIOR (emitted coarse, ``interior=true``) only when all 4 bbox
  corners are strictly inside and no ring vertex / edge bbox touches the
  cell bbox — then every point of the cell is inside the ring, so the
  PIP refine can skip the ray cast for its points;
- everything else is BOUNDARY: subdivided until the finest level, then
  emitted with ``interior=false`` (ray-cast refine applies).

Emission levels are restricted to a small fixed ladder (default
7/10/13) so the point-side prefilter join stays a handful of broadcast
equi-joins on bit-math ancestor keys — never a range join. The finest
level is chosen per polygon from a cell budget (perimeter estimate), the
same bounded-size guarantee S2RegionCoverer's max_cells gives.
"""

from __future__ import annotations

import numpy as np

from . import geometry, s2

DEFAULT_LEVELS: tuple[int, ...] = (7, 10, 13)


def _cells_bbox(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int):
    """Inflated lat/lon bbox of cells given by (face, i, j) arrays."""
    n = float(1 << level)
    corner_lat = np.empty((4, face.size))
    corner_lon = np.empty((4, face.size))
    for c, (di, dj) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        u = s2._st_to_uv((i.astype(np.float64) + di) / n)
        v = s2._st_to_uv((j.astype(np.float64) + dj) / n)
        x, y, z = s2._face_uv_to_xyz(face, u, v)
        norm = np.sqrt(x * x + y * y + z * z)
        corner_lat[c], corner_lon[c] = geometry.unit_xyz_to_latlon(x / norm, y / norm, z / norm)
    lat_min, lat_max = corner_lat.min(axis=0), corner_lat.max(axis=0)
    lon_min, lon_max = corner_lon.min(axis=0), corner_lon.max(axis=0)
    # inflation: 5% of the cell's angular extent dominates edge curvature
    pad_lat = 0.05 * (lat_max - lat_min) + 1e-9
    pad_lon = 0.05 * (lon_max - lon_min) + 1e-9
    # cells straddling the antimeridian get a full-span (conservative) box
    wrap = (lon_max - lon_min) > 180.0
    return (
        lat_min - pad_lat,
        lat_max + pad_lat,
        np.where(wrap, -180.0, lon_min - pad_lon),
        np.where(wrap, 180.0, lon_max + pad_lon),
    )


def _classify(ring: np.ndarray, lat_lo, lat_hi, lon_lo, lon_hi):
    """→ (disjoint, interior) boolean arrays for cell bboxes vs a ring."""
    r = ring[:-1] if (ring.shape[0] > 1 and (ring[0] == ring[-1]).all()) else ring
    vy, vx = r[:, 0], r[:, 1]
    ey_lo = np.minimum(vy, np.roll(vy, -1))
    ey_hi = np.maximum(vy, np.roll(vy, -1))
    ex_lo = np.minimum(vx, np.roll(vx, -1))
    ex_hi = np.maximum(vx, np.roll(vx, -1))
    # any ring-EDGE bbox overlapping the cell bbox? (cells × edges)
    overlap = (
        (ey_lo[None, :] <= lat_hi[:, None])
        & (ey_hi[None, :] >= lat_lo[:, None])
        & (ex_lo[None, :] <= lon_hi[:, None])
        & (ex_hi[None, :] >= lon_lo[:, None])
    ).any(axis=1)
    # corners only matter for cells NOT touching any edge bbox (cells with
    # overlap are boundary regardless); binned ray cast prunes edge tests
    interior = np.zeros(overlap.size, dtype=bool)
    disjoint = np.zeros(overlap.size, dtype=bool)
    free = ~overlap
    if free.any():
        fl = np.nonzero(free)[0]
        clat = np.stack([lat_lo[fl], lat_lo[fl], lat_hi[fl], lat_hi[fl]]).ravel()
        clon = np.stack([lon_lo[fl], lon_hi[fl], lon_lo[fl], lon_hi[fl]]).ravel()
        corner_in = geometry.points_in_ring_binned(clat, clon, ring).reshape(4, -1)
        interior[fl] = corner_in.all(axis=0)
        disjoint[fl] = ~corner_in.any(axis=0)
    return disjoint, interior


def _children(face: np.ndarray, i: np.ndarray, j: np.ndarray, d: int):
    """All 4^d descendants d levels down (vectorized block expansion)."""
    step = 1 << d
    di, dj = np.meshgrid(np.arange(step), np.arange(step), indexing="ij")
    di, dj = di.ravel(), dj.ravel()
    fo = np.repeat(face, di.size)
    io = (i[:, None] << d) + di[None, :]
    jo = (j[:, None] << d) + dj[None, :]
    return fo, io.ravel(), jo.ravel()


def pick_finest_level(ring: np.ndarray, levels=DEFAULT_LEVELS, max_cells: int = 8192) -> int:
    """Finest ladder level whose boundary-cell estimate fits the budget."""
    r = ring[:-1] if (ring.shape[0] > 1 and (ring[0] == ring[-1]).all()) else ring
    seg = np.abs(np.diff(r, axis=0, append=r[:1])).sum(axis=1)  # L1 in degrees
    perim_deg = float(seg.sum())
    for lv in sorted(levels, reverse=True):
        cell_deg = 90.0 / (1 << lv) * 1.6
        if 3.0 * perim_deg / max(cell_deg, 1e-12) <= max_cells:
            return lv
    return min(levels)


def polygon_covering(
    ring: np.ndarray, levels=DEFAULT_LEVELS, max_cells: int = 8192
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (cell_id, level, interior) arrays covering the ring.

    Guarantee: every finest-level cell containing an interior point of
    the ring is a descendant-or-self of some returned cell (valid join
    prefilter superset). ``interior=true`` cells lie entirely inside.
    """
    ring = np.asarray(ring, dtype=np.float64)
    finest = pick_finest_level(ring, levels, max_cells)
    ladder = sorted(lv for lv in levels if lv <= finest)

    # seeds: half-cell-spaced samples of the bbox at the coarsest level
    lat_min, lat_max, lon_min, lon_max = geometry.ring_bbox(ring)
    l0 = ladder[0]
    step = 90.0 / (1 << l0) / 2.0
    lats = np.arange(lat_min - step, lat_max + 2 * step, step)
    lons = np.arange(lon_min - step, lon_max + 2 * step, min(step / max(np.cos(np.radians((lat_min + lat_max) / 2)), 0.05), 90.0))
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    x, y, z = geometry.latlon_to_unit_xyz(glat.ravel(), glon.ravel())
    face, u, v = s2._xyz_to_face_uv(x, y, z)
    fi = s2._st_to_ij(s2._uv_to_st(u), l0)
    fj = s2._st_to_ij(s2._uv_to_st(v), l0)
    seeds = np.unique(np.stack([face, fi, fj], axis=1), axis=0)
    face, fi, fj = seeds[:, 0], seeds[:, 1], seeds[:, 2]

    out_ids, out_lvl, out_int = [], [], []
    for idx, lv in enumerate(ladder):
        if face.size == 0:
            break
        disjoint, interior = _classify(ring, *_cells_bbox(face, fi, fj, lv))
        last = lv == ladder[-1]
        emit_int = interior & ~disjoint
        emit_bnd = (~interior & ~disjoint) if last else np.zeros_like(disjoint)
        for mask, flag in ((emit_int, True), (emit_bnd, False)):
            if mask.any():
                out_ids.append(s2.face_ij_to_cell_id(face[mask], fi[mask], fj[mask], lv))
                out_lvl.append(np.full(mask.sum(), lv, dtype=np.int32))
                out_int.append(np.full(mask.sum(), flag, dtype=bool))
        if not last:
            sub = ~disjoint & ~interior
            face, fi, fj = _children(face[sub], fi[sub], fj[sub], ladder[idx + 1] - lv)
    if not out_ids:
        return np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, bool)
    return np.concatenate(out_ids), np.concatenate(out_lvl), np.concatenate(out_int)


def ancestor_at_level_expr(cell_col: str, from_level: int, to_level: int) -> str:
    """SQL for the ancestor of an S2 id (bit math; works for negative ids).

    ancestor = (id & -(2*lsb)) | lsb, lsb = 1 << (2*(MAX_LEVEL-to_level)).
    """
    assert to_level <= from_level
    lsb = 1 << (2 * (s2.MAX_LEVEL - to_level))
    return f"(({cell_col} & {-(2 * lsb)}) | {lsb})"
