#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
fixture parquet tables, loads the Spark result parquet from
<outdir>/<name>/, sorts columns by name on both sides, and compares
row count, schema (column names), and values.

Usage: python3 check_correctness.py <sfdir> <outdir> [only]
  only: comma-separated query names (or 'name!' to exclude) — lets a
  big-SF sweep split the quadratic oracles (all-pairs jaccard,
  recursive-CTE components) from the cheap tail. With --times, each
  oracle's wall seconds stream to stderr as they finish.
"""
import hashlib, json, os, sys, math, time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

CACHE_DIR = os.environ.get("ORACLE_CACHE_DIR",
                           "/root/repo/target/oracle_cache")


def fixture_stamp(sfdir):
    """Content stamp of the fixture: (name, size, mtime_ns) of every
    table parquet. Keys the oracle-result cache — a regenerated fixture
    invalidates every cached oracle automatically."""
    parts = []
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        except FileNotFoundError:
            parts.append(f"{t}:missing")
    return ";".join(parts)


def cached_oracle(con, sql, stamp):
    """DuckDB oracle result with a parquet cache keyed by
    md5(sql + fixture stamp). sf1 certification reruns cost minutes
    warm instead of hours (dedup_simhash_pairs alone was 695 s cold).

    A cache entry is committed only if it round-trips to the SAME
    frame_sig as the live fetchdf result — parquet can change nested
    cell representations (dict vs struct-array), and a warm run must
    never flip a verdict the cold run would have given. The key folds
    in the duckdb + pandas versions: a library upgrade that changes
    fetchdf or parquet decoding (dtype/nested representation) must
    invalidate the cache rather than serve a stale normalized frame."""
    libs = f"duckdb={duckdb.__version__};pandas={pd.__version__}"
    key = hashlib.md5((sql + "\n--stamp--\n" + stamp +
                       "\n--libs--\n" + libs).encode()).hexdigest()
    path = f"{CACHE_DIR}/{key}.parquet"
    if os.path.exists(path):
        return pd.read_parquet(path)
    odf = con.execute(sql).fetchdf()
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        odf.to_parquet(tmp)
        if frame_sig(pd.read_parquet(tmp)) == frame_sig(odf):
            os.replace(tmp, path)
        else:
            os.unlink(tmp)
    except Exception:
        pass  # cache is an optimization; uncacheable dtypes just rerun
    return odf


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_sig(df):
    cols = sorted(df.columns)
    # The driver sorts rows with pandas sort_values over ALL columns
    # before hashing. Python lists / numpy arrays in cells are unhashable
    # and crash its lexsort (r6: doc_winnow, map_functions). Replicate
    # that sort here so the crash class is caught locally.
    body = df[cols].sort_values(by=cols, kind="mergesort")
    rows = [tuple(norm_cell(v) for v in row)
            for row in body.itertuples(index=False, name=None)]
    return cols, rows


def num_kinds(df):
    """Column -> 'i' (integer) or 'f' (float) for numeric columns.

    The driver's comparator is dtype-sensitive: DuckDB widens sum(BIGINT)
    to INT128 which pandas renders as float64 (2932.0), hashing differently
    from Spark's int64 (2932) even though %.10g hides it here. Flag any
    int-vs-float disagreement so that class of bug is caught locally.
    """
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        if k in ("i", "u"):
            out[c] = "i"
        elif k == "f":
            out[c] = "f"
    return out


def main(sfdir, outdir, only=None, times=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        names = {n.rstrip("!") for n in only.split(",")}
        exclude = all(n.endswith("!") for n in only.split(","))
        oracle = {k: v for k, v in oracle.items()
                  if (k not in names) == exclude}
    stamp = fixture_stamp(sfdir)
    results = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            odf = cached_oracle(con, sql, stamp)
        except Exception as e:
            results[name] = {"status": "oracle_error", "err": str(e)[:200]}
            continue
        finally:
            if times:
                print(f"[oracle] {name} {time.time() - t0:.1f}s",
                      file=sys.stderr, flush=True)
        try:
            sdf = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            results[name] = {"status": "spark_missing", "err": str(e)[:200]}
            continue
        try:
            ocols, orows = frame_sig(odf)
            scols, srows = frame_sig(sdf)
        except Exception as e:
            # mirrors a driver-side checker crash (err != null in
            # CORRECTNESS_r*.json) — usually an unhashable ARRAY cell
            results[name] = {"status": "driver_sort_crash",
                             "err": str(e)[:200]}
            continue
        ok_k, sk_k = num_kinds(odf), num_kinds(sdf)
        kind_diff = {c: (ok_k[c], sk_k[c]) for c in ok_k
                     if c in sk_k and ok_k[c] != sk_k[c]}
        r = {"rows_match": len(orows) == len(srows),
             "schema_match": ocols == scols,
             "hash_match": orows == srows and not kind_diff}
        if kind_diff:
            r["dtype_mismatch"] = {c: f"oracle={a} spark={b}"
                                   for c, (a, b) in kind_diff.items()}
        if not r["schema_match"]:
            r["oracle_cols"] = ocols
            r["spark_cols"] = scols
        elif not r["hash_match"]:
            for i, (a, b) in enumerate(zip(orows, srows)):
                if a != b:
                    r["first_diff"] = {"row": i, "oracle": a[:8], "spark": b[:8]}
                    break
            else:
                r["first_diff"] = {"note": f"row count {len(orows)} vs {len(srows)}"}
        r["status"] = "ok" if all(
            [r["rows_match"], r["schema_match"], r["hash_match"]]) else "MISMATCH"
        results[name] = r
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{n_ok}/{len(results)} green")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--times"]
    main(args[0], args[1], args[2] if len(args) > 2 else None,
         times="--times" in sys.argv)
