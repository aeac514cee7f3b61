#!/usr/bin/env python3
"""Materialize an sf1.0-scale fixture by a key-consistent 10x blowup
of the driver's sf0.1 tables (the read-only fixtures stop at sf0.1;
the heavy-tail gate needs one order of magnitude more).

Scaling rule: every synthetic key k becomes k*10+copy for copy in
0..9, applied CONSISTENTLY across fact/dimension tables so referential
integrity and join fan-out per key are preserved exactly (each order
still has the same lineitems, each customer the same orders — the
corpus is 10 independent shifted replicas, so per-key distributions
and skew shape match sf0.1 while global volumes are 10x). Dimension
leaves (region/nation) stay fixed, as in TPC-H. Copy 0 is the
original data verbatim.

Text/measure columns are copied unchanged EXCEPT documents.text,
which gets a per-copy variant suffix (near-dup family, not exact dup
— the same convention as ScaleProbe) with n_chars kept consistent.
Monetary/date columns are untouched so value distributions are
identical.

Output: /tmp/graft_sf1/<table>.parquet (one file each, like the
driver fixtures). DuckDB oracles run against these same files, so
correctness checks are generation-agnostic.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
MULT = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TEMP TABLE copies AS SELECT unnest(range({MULT})) AS cp")


def emit(table, select):
    out = f"{DST}/{table}.parquet"
    con.execute(
        f"COPY ({select}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"[gen_sf1] {table}: {n} rows")


for t in ("region", "nation"):
    emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

emit("customer", f"""
  SELECT c_custkey * {MULT} + cp AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', copies""")

emit("supplier", f"""
  SELECT s_suppkey * {MULT} + cp AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM '{SRC}/supplier.parquet', copies""")

emit("part", f"""
  SELECT p_partkey * {MULT} + cp AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet', copies""")

emit("orders", f"""
  SELECT o_orderkey * {MULT} + cp AS o_orderkey,
         o_custkey * {MULT} + cp AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', copies""")

emit("lineitem", f"""
  SELECT l_orderkey * {MULT} + cp AS l_orderkey,
         l_partkey * {MULT} + cp AS l_partkey,
         l_suppkey * {MULT} + cp AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', copies""")

emit("events", f"""
  SELECT event_id * {MULT} + cp AS event_id, ts,
         user_id * {MULT} + cp AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', copies""")

emit("documents", f"""
  SELECT doc_id * {MULT} + cp AS doc_id,
         CASE WHEN cp = 0 THEN text
              ELSE text || ' variant marker ' || CAST(cp AS VARCHAR)
         END AS text,
         lang, source,
         CASE WHEN cp = 0 THEN n_chars
              ELSE n_chars + length(' variant marker ')
                   + length(CAST(cp AS VARCHAR))
         END AS n_chars
  FROM '{SRC}/documents.parquet', copies""")

emit("embeddings", f"""
  SELECT vec_id * {MULT} + cp AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet', copies""")

print(f"[gen_sf1] wrote {DST} (x{MULT} of {SRC})")
