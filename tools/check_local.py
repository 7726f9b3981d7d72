#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the matching oracle SQL (oracle_sql.json) in DuckDB with views over the
sfDir tables, and compare row count, column names/types, and exact values
(columns sorted by name, rows in emitted order AND sorted order).
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    import os
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n_rows_only += 1
            print(f"ROWS-ONLY {name}: rows={spark_rel.shape[0]}")
            continue
        try:
            ora_rel = con.sql(oracle[name])
            sp_cols = sorted(spark_rel.columns)
            or_cols = sorted(ora_rel.columns)
            if sp_cols != or_cols:
                print(f"FAIL {name}: columns spark={sp_cols} oracle={or_cols}")
                n_fail += 1
                continue
            sp = spark_rel.df()[sp_cols]
            od = ora_rel.df()[or_cols]
            if len(sp) != len(od):
                print(f"FAIL {name}: rowcount spark={len(sp)} oracle={len(od)}")
                n_fail += 1
                continue
            # types
            ty_sp = [str(t) for t in sp.dtypes]
            ty_od = [str(t) for t in od.dtypes]
            if ty_sp != ty_od:
                print(f"WARN {name}: dtypes spark={ty_sp} oracle={ty_od}")
            sp2 = sp.reset_index(drop=True)
            od2 = od.reset_index(drop=True)
            neq = []
            for c in sp_cols:
                a, b = sp2[c], od2[c]
                if len(a) > 0 and (isinstance(a.iloc[0], (list, tuple))
                                   or type(a.iloc[0]).__name__ == "ndarray"):
                    a = a.map(lambda v: json.dumps(list(v)))
                    b = b.map(lambda v: json.dumps(list(v)))
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    neq.append((c, int((~eq).sum()), a[~eq].head(2).tolist(), b[~eq].head(2).tolist()))
            if neq:
                print(f"FAIL {name}: value diffs {neq[:3]}")
                n_fail += 1
            else:
                n_pass += 1
                print(f"PASS {name} ({len(sp)} rows)")
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
