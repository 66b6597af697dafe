"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at a given sf, compare row count,
column-name set, and an order-insensitive value hash.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> tuple[int, list[str], str]:
    import pandas as pd

    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False):
        vals = []
        for v in tup:
            if isinstance(v, float):
                vals.append(f"{v:.6f}" if v == v else "nan")
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def main() -> int:
    import json
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # SPARK_GRAFT_CORRECTNESS_OUT=<path>: also write a CORRECTNESS-style
    # JSON artifact (per-query rows/schema/hash matches) — used to certify
    # the suite at LARGER sf than the driver's own sf0.01 gate, catching
    # size-dependent bugs (span guards, AQE plan flips, skew paths)
    out_path = os.environ.get("SPARK_GRAFT_CORRECTNESS_OUT")
    artifact: dict[str, dict] = {}

    import __spark_entry__ as E
    from aardvark_geometry_quadtree_spark.session import get_spark

    spark = get_spark(app_name="oracle-compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            sn, scols, shash = canon(sdf)
        except Exception as ex:
            print(f"{name:24s} SPARK-ERROR {str(ex).splitlines()[0][:120]}")
            artifact[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": None,
                              "oracle_rows": None, "err": f"spark: {str(ex).splitlines()[0][:200]}"}
            n_fail += 1
            continue
        if name not in osql:
            print(f"{name:24s} rows-only  n={sn}")
            artifact[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": sn,
                              "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            on, ocols, ohash = canon(con.sql(osql[name]).df())
        except Exception as ex:
            print(f"{name:24s} ORACLE-ERROR {str(ex).splitlines()[0][:120]}")
            artifact[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": sn,
                              "oracle_rows": None, "err": f"oracle: {str(ex).splitlines()[0][:200]}"}
            n_fail += 1
            continue
        ok = (sn == on) and (scols == ocols) and (shash == ohash)
        status = "OK " if ok else "FAIL"
        if not ok:
            n_fail += 1
        artifact[name] = {"rows_match": sn == on, "schema_match": scols == ocols,
                          "hash_match": shash == ohash, "spark_rows": sn,
                          "oracle_rows": on, "err": None}
        print(f"{name:24s} {status} spark={sn} oracle={on} cols={'=' if scols == ocols else (scols, ocols)} hash={'=' if shash == ohash else 'DIFF'}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"artifact -> {out_path}")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
