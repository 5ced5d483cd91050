"""Hex cell ids as a DuckDB SQL expression — the oracle twin of hexgrid.py.

``geo_to_cell`` (spatial/hexgrid.py) is numpy; this module emits the
IDENTICAL computation as ANSI-ish SQL so the driver's DuckDB oracle can
value-check hex-keyed queries exactly, the same way spatial/s2_expr.py
twins s2.py. Every float constant (face centers / tangent bases /
per-resolution lattice size + rotation) is emitted via ``repr`` — the
shortest round-trip decimal — so both engines start from bit-identical
doubles; op order mirrors the numpy source line-for-line. Cell ids are
discrete, so last-ulp libm differences only matter for points within
~1e-10 of a hex boundary (measure-zero for the deterministic test
lattices, same argument as the S2 twin).

Face selection is argmax over 20 face-center dot products → expressed as
a 20-row inline VALUES join + row_number (dot DESC, face ASC = numpy
argmax-first tie break). Cube rounding uses round_even (numpy half-to-
even). Packing is pure addition over disjoint bit ranges.
"""

from __future__ import annotations

import numpy as np

from . import hexgrid


def _faces_values() -> str:
    rows = []
    for f in range(20):
        cx, cy, cz = (repr(float(v)) for v in hexgrid._FACE_CENTERS[f])
        xx, xy, xz = (repr(float(v)) for v in hexgrid._FACE_X[f])
        yx, yy, yz = (repr(float(v)) for v in hexgrid._FACE_Y[f])
        rows.append(f"({f}, {cx}, {cy}, {cz}, {xx}, {xy}, {xz}, {yx}, {yy}, {yz})")
    return ",\n   ".join(rows)


def hex_cell_sql_duckdb(lat: str, lon: str, res: int, out: str = "hex_cell") -> str:
    """Subquery template computing ``geo_to_cell(lat, lon, res)``.

    Caller supplies the FROM source via ``.format(src=...)``; all input
    columns pass through. Requires a unique ``id`` column in the source
    (used to pick the argmax face per point).
    """
    size, theta = hexgrid._res_basis(res)
    c, s = np.cos(-theta), np.sin(-theta)
    sqrt3_3 = np.sqrt(3.0) / 3.0
    one_3 = 1.0 / 3.0
    two_3 = 2.0 / 3.0
    off = 1 << 24
    base = (5 << 60) + (res << 56)
    return f"""(
  SELECT * EXCLUDE (_fq, _fr, _face),
         {base} + _face * {1 << 50} + (_fq + {off}) * {1 << 25} + (_fr + {off}) AS {out}
  FROM (
    SELECT * EXCLUDE (_q, _r, _rq, _rr, _rs, _dq, _dr, _ds, _q2),
           _q2 AS _fq,
           CAST(CASE WHEN NOT (_dq > _dr AND _dq > _ds) AND _dr > _ds
                     THEN -_q2 - _rs ELSE _rr END AS BIGINT) AS _fr
    FROM (
      SELECT *,
             CAST(CASE WHEN _dq > _dr AND _dq > _ds THEN -_rr - _rs ELSE _rq END AS BIGINT) AS _q2
      FROM (
        SELECT *,
               abs(_rq - _q) AS _dq, abs(_rr - _r) AS _dr, abs(_rs - (-_q - _r)) AS _ds
        FROM (
          SELECT *,
                 round_even(_q, 0) AS _rq, round_even(_r, 0) AS _rr,
                 round_even(-_q - _r, 0) AS _rs
          FROM (
            SELECT * EXCLUDE (_rx, _ry),
                   ({repr(sqrt3_3)} * _rx - {repr(one_3)} * _ry) / {repr(float(size))} AS _q,
                   ({repr(two_3)} * _ry) / {repr(float(size))} AS _r
            FROM (
              SELECT * EXCLUDE (_px, _py),
                     _px * {repr(float(c))} - _py * {repr(float(s))} AS _rx,
                     _px * {repr(float(s))} + _py * {repr(float(c))} AS _ry
              FROM (
                SELECT * EXCLUDE (_x, _y, _z, _cx, _cy, _cz,
                                  _xx, _xy, _xz, _yx, _yy, _yz, _scale, _rn),
                       (_x * _scale - _cx) * _xx + (_y * _scale - _cy) * _xy
                         + (_z * _scale - _cz) * _xz AS _px,
                       (_x * _scale - _cx) * _yx + (_y * _scale - _cy) * _yy
                         + (_z * _scale - _cz) * _yz AS _py
                FROM (
                  SELECT pts.*, fc.face AS _face,
                         fc.cx AS _cx, fc.cy AS _cy, fc.cz AS _cz,
                         fc.xx AS _xx, fc.xy AS _xy, fc.xz AS _xz,
                         fc.yx AS _yx, fc.yy AS _yy, fc.yz AS _yz,
                         1.0 / (pts._x * fc.cx + pts._y * fc.cy + pts._z * fc.cz) AS _scale,
                         row_number() OVER (
                           PARTITION BY pts.id
                           ORDER BY pts._x * fc.cx + pts._y * fc.cy + pts._z * fc.cz DESC,
                                    fc.face ASC) AS _rn
                  FROM (
                    SELECT *,
                           cos(radians({lat})) * cos(radians({lon})) AS _x,
                           cos(radians({lat})) * sin(radians({lon})) AS _y,
                           sin(radians({lat})) AS _z
                    FROM {{src}}
                  ) pts
                  CROSS JOIN (VALUES
   {_faces_values()}
                  ) fc(face, cx, cy, cz, xx, xy, xz, yx, yy, yz)
                  QUALIFY _rn = 1
                )
              )
            )
          )
        )
      )
    )
  )
)"""
