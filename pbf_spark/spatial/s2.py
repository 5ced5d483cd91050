"""S2 cell ids (level ≤ 30), fully vectorized numpy.

From-scratch implementation of the published S2 cell-id scheme
(s2geometry.io — cube-face quadratic projection + Hilbert space-filling
curve; no s2 library exists in this environment, SURVEY.md env facts):

- unit sphere → cube face (0..5 = +x,+y,+z,-x,-y,-z by largest axis)
- face (u,v) ∈ [-1,1]² via per-face tangent ratios
- quadratic uv→st reprojection (equalizes cell areas)
- st → ij at level 30 (2^30 grid)
- Hilbert curve position via the 4-orientation lookup tables
  (kIJtoPos / kPosToOrientation); initial orientation = face & 1
- 64-bit id = face(3 bits) · position(2·level bits) · trailing 1

SURVEY.md §2B B4 (level-13 assignment for join prefilter). Everything is
int64/float64 array math — one batch pass, no per-row Python.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell order per orientation; ij index = (i_bit << 1) | j_bit
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 3, 1, 2],  # swapped
        [2, 3, 1, 0],  # inverted
        [2, 1, 3, 0],  # swapped + inverted
    ],
    dtype=np.int64,
).reshape(-1)  # indexed by orientation*4 + ij

_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
).reshape(-1)  # indexed by orientation*4 + pos

_POS_TO_ORIENTATION = np.array([1, 0, 0, 3], dtype=np.int64)  # swap, 0, 0, swap|invert


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2)).astype(np.int64)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(
            face, [y / x, -x / y, -x / z, z / x, z / y, -y / z]
        )
        v = np.choose(
            face, [z / x, z / y, -y / z, y / x, -x / y, -x / z]
        )
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    one = np.ones_like(u)
    # face: 0:(1,u,v) 1:(-u,1,v) 2:(-u,-v,1) 3:(-1,-v,-u) 4:(v,-1,-u) 5:(v,u,-1)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u):
    pos = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0, pos, 1.0 - pos)


def _st_to_uv(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) ** 2)
    )


def _st_to_ij(s, level: int):
    n = 1 << level
    return np.clip((np.asarray(s) * n).astype(np.int64), 0, n - 1)


def face_ij_to_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position (2·level bits) of (i, j) on a face."""
    orientation = face & 1
    pos = np.zeros_like(i, dtype=np.int64)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orientation * 4 + ij]
        pos = (pos << 2) | p
        orientation = orientation ^ _POS_TO_ORIENTATION[p]
    return pos


def pos_to_face_ij(pos: np.ndarray, face: np.ndarray, level: int):
    """Inverse of face_ij_to_pos."""
    orientation = face & 1
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orientation * 4 + p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation = orientation ^ _POS_TO_ORIENTATION[p]
    return i, j


def lat_lon_to_cell_id(lat, lon, level: int = 13) -> np.ndarray:
    """Degrees → S2 cell id at ``level`` (int64, vectorized)."""
    from .geometry import latlon_to_unit_xyz

    x, y, z = latlon_to_unit_xyz(np.asarray(lat, np.float64), np.asarray(lon, np.float64))
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u), level)
    j = _st_to_ij(_uv_to_st(v), level)
    return face_ij_to_cell_id(face, i, j, level)


def face_ij_to_cell_id(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """(face, i, j) at ``level`` → 64-bit cell id (trailing-1 format)."""
    pos = face_ij_to_pos(face, i, j, level)
    shift = 2 * (MAX_LEVEL - level) + 1
    lsb = np.int64(1) << np.int64(shift - 1)
    return (face.astype(np.int64) << np.int64(61)) | (pos << np.int64(shift)) | lsb


def cell_id_to_face_pos(cell_id: np.ndarray, level: int):
    shift = 2 * (MAX_LEVEL - level) + 1
    face = (cell_id >> np.int64(61)) & 7
    pos = (cell_id >> np.int64(shift)) & ((np.int64(1) << np.int64(2 * level)) - 1)
    return face, pos


def cell_id_level(cell_id: np.ndarray) -> np.ndarray:
    """Level from trailing-one position."""
    lsb = cell_id & (-cell_id)
    return MAX_LEVEL - (np.int64(np.round(np.log2(lsb.astype(np.float64)))) >> 1)


def cell_id_to_center(cell_id: np.ndarray, level: int):
    """Cell id → (lat, lon) of the cell center (degrees)."""
    from .geometry import unit_xyz_to_latlon

    face, pos = cell_id_to_face_pos(np.asarray(cell_id, np.int64), level)
    i, j = pos_to_face_ij(pos, face, level)
    n = float(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    return unit_xyz_to_latlon(x / norm, y / norm, z / norm)


def parent_cell_id(cell_id: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Parent cell at a coarser level (pure bit math — hierarchy is free)."""
    face, pos = cell_id_to_face_pos(np.asarray(cell_id, np.int64), level)
    ppos = pos >> np.int64(2 * (level - parent_level))
    shift = 2 * (MAX_LEVEL - parent_level) + 1
    lsb = np.int64(1) << np.int64(shift - 1)
    return (face << np.int64(61)) | (ppos << np.int64(shift)) | lsb


def cell_size_m(level: int) -> float:
    """Approximate max cell edge length in meters at a level (sphere)."""
    # cube face spans ~90° of arc = ~10,007 km across 2^level cells; the
    # quadratic projection bounds distortion within ~1.6x
    from .geometry import EARTH_RADIUS_M

    face_span_m = (np.pi / 2.0) * EARTH_RADIUS_M
    return 1.6 * face_span_m / (1 << level)
