#!/usr/bin/env python3
"""Generate the sf1 SOAK fixture: 10 key-shifted copies of every sf0.1
table, written to an out dir (default /tmp/testdata_sf1).

Purpose (VERDICT r19 task 4): measured evidence that the headline
queries scale near-linearly sf0.1 -> sf1 with no plan-shape change.
This is a TIMING fixture, not a correctness one — the DuckDB oracle
gate stays on the driver-generated sf0.01; key-slice moduli that the
shift constant does not divide (e.g. % 7) land on different rows per
copy but keep their proportions, which is all a soak needs.

Shape choices:
  - keys shift by copy*1e9 (divisible by 4, 10, 25 — the moduli the
    c38/d0 slice semantics lean on), so foreign keys stay consistent
    per copy and every join behaves.
  - documents: copies carry a one-token suffix (' cpN'), so exact dedup
    does NOT collapse them but near-dup (shingle Jaccard ~0.9) DOES —
    a duplicate-heavy web-crawl shape that stress-tests the banding +
    connected-components path with planted 10-cliques.
  - embeddings: copies perturb every component by copy*1e-3 — distinct
    vectors, same geometry, 10x the index build and probe work.
  - region/nation stay dimension-sized (25 nations is the schema, not
    a scale knob).
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
K = 1_000_000_000  # key shift per copy

import os

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def gen(table: str, select: str) -> None:
    copies = " UNION ALL ".join(
        f"SELECT {select.format(i=i, shift=i * K)} FROM src" for i in range(COPIES)
    )
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
    con.execute(f"COPY ({copies}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# dimension tables: unscaled (one copy, unchanged)
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("customer",
    "c_custkey + {shift}  AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
gen("supplier",
    "s_suppkey + {shift}  AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",
    "p_partkey + {shift}  AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
gen("orders",
    "o_orderkey + {shift} AS o_orderkey, o_custkey + {shift} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem",
    "l_orderkey + {shift} AS l_orderkey, l_partkey + {shift} AS l_partkey, "
    "l_suppkey + {shift} AS l_suppkey, l_linenumber, "
    "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
gen("events",
    "event_id + {shift} AS event_id, ts, user_id + {shift} AS user_id, "
    "event_type, value, props")
gen("documents",
    "doc_id + {shift}  AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE text || ' cp{i}' END AS text, lang, source, "
    "CASE WHEN {i} = 0 THEN n_chars ELSE n_chars + length(' cp{i}') END AS n_chars")
gen("embeddings",
    "vec_id + {shift}  AS vec_id, "
    "CASE WHEN {i} = 0 THEN embedding ELSE "
    "CAST(list_transform(embedding, x -> CAST(x + {i} * 0.001 AS FLOAT)) AS FLOAT[]) END "
    "AS embedding, label")
print(f"sf1 fixture at {OUT} ({COPIES} copies, shift {K})")
