"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
the same sf_dir, compare row count + column names + order-insensitive
value hash. Usage: python tools/check_entry.py [sf_dir] [only_query]"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(cols).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return len(df), cols, hashlib.md5(payload).hexdigest()[:12]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entry
    from dedup.session import get_spark

    spark = get_spark("check-entry", master="local[8]", config=entry.CFG)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name != only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_secs:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures += 1
        print(f"{status} {name}: spark {sn} rows {sh} | duckdb {on} rows {oh} [{spark_secs:.1f}s]")
        if not ok and sn and on:
            scd = sdf[sorted(sdf.columns)].copy()
            ocd = odf[sorted(odf.columns)].copy()
            print("   spark cols:", list(sc), "duck cols:", list(oc))
            print("   spark head:", scd.sort_values(sorted(scd.columns)).head(2).to_dict("records"))
            print("   duck  head:", ocd.sort_values(sorted(ocd.columns)).head(2).to_dict("records"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
