#!/usr/bin/env python3
"""Constant-duplication documents fixture for the dedup_components
exponent closure (VERDICT r13 task 4).

The sf1/sf3 blowup grows each base doc's near-dup FAMILY with the
multiplier, so the exact-jaccard edge set grows quadratically with the
data (x9 edges for x3 docs) and the measured sf1->sf3 exponent (1.18)
reflects the fixture's edge growth, not the operator's work growth.
This generator scales the NUMBER of families instead, holding family
size constant at FAM members:

- every base doc spawns GROUPS families of FAM members each;
- cross-family similarity is destroyed by interleaving a
  family-unique marker token between every pair of words (every
  2-token shingle then contains the marker, so two families share
  ZERO shingles and can never form an edge);
- within a family, member m > 0 appends ' variant marker m' — the
  same near-dup convention as gen_sf1, and IDENTICAL across families,
  so edges-per-family is exactly constant.

Total edges therefore scale LINEARLY with GROUPS: comparing GROUPS=G
vs GROUPS=3G isolates the operator's own exponent at matched edge
budget.

Usage: gen_const_dup.py <src_docs_dir> <dst_dir> <groups> [fam=3]
"""
import os
import sys

import duckdb

SRC = sys.argv[1]
DST = sys.argv[2]
GROUPS = int(sys.argv[3])
FAM = int(sys.argv[4]) if len(sys.argv) > 4 else 3

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TEMP TABLE gs AS SELECT unnest(range({GROUPS})) AS g")
con.execute(f"CREATE TEMP TABLE ms AS SELECT unnest(range({FAM})) AS m")

out = f"{DST}/documents.parquet"
con.execute(f"""
COPY (
  SELECT (doc_id * {GROUPS} + g) * {FAM} + m AS doc_id,
         regexp_replace(text, '[^a-zA-Z0-9]+',
             ' f' || CAST(doc_id AS VARCHAR) || 'g'
                  || CAST(g AS VARCHAR) || ' ', 'g')
           || CASE WHEN m = 0 THEN ''
              ELSE ' variant marker ' || CAST(m AS VARCHAR) END AS text,
         lang, source,
         CAST(length(regexp_replace(text, '[^a-zA-Z0-9]+',
             ' f' || CAST(doc_id AS VARCHAR) || 'g'
                  || CAST(g AS VARCHAR) || ' ', 'g'))
           + CASE WHEN m = 0 THEN 0
             ELSE length(' variant marker ' || CAST(m AS VARCHAR)) END
           AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet', gs, ms
) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)""")
n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
print(f"[gen_const_dup] {out}: {n} docs "
      f"(groups={GROUPS}, fam={FAM})")
