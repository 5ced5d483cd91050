"""Local stand-in for the driver's DuckDB oracle comparison.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same sf dir; compares row count, column names, and
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding) — approximating the driver gate
so mismatches surface before CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        s = d[c]
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (list, tuple)):
            d[c] = s.map(lambda v: ",".join(map(str, v)))
        elif str(s.dtype).startswith(("float", "Float")):
            d[c] = s.map(lambda v: f"{v:.6f}" if pd.notna(v) else "NULL")
        elif "datetime" in str(s.dtype):
            d[c] = s.astype("datetime64[us]").astype(str)
        else:
            d[c] = s.astype(str)
    rows = sorted("\x01".join(r) for r in d.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pbf_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: spark({sn} rows, {sh}) duckdb({on} rows, {oh})")
        if status == "FAIL":
            if sc != oc:
                print(f"      cols spark={sc} duckdb={oc}")
            if sn == on and sc == oc:
                merged = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                omerged = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                diff = (merged.astype(str) != omerged.astype(str)).any(axis=1)
                print("      first diffs:")
                print(pd.concat([merged[diff].head(3), omerged[diff].head(3)], keys=["spark", "duckdb"]))
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(1 if main(sf, only) else 0)
