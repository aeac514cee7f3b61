#!/usr/bin/env python3
"""Exact output-independent replays for the two sf1 oracles whose
DuckDB form is a full quadratic self-join (infeasible within the
certification budget at sf1):

- fuzzy_join_names (lev <= 1 over 150k customer names): FastSS
  deletion-neighborhood candidates — lev(s,t) <= 1 implies s and t
  share a key in D1(x) = {x} | {x minus one char} — then exact
  Levenshtein verification. COMPLETE (the neighborhood bound is a
  theorem, not a heuristic), cost O(n * len) keys.
- sim_neardup_exact (cosine >= 0.5 over 20k embeddings): blocked
  numpy upper-triangle cosine — the same arithmetic, vectorized.
  Exact to float64.

Each replay recomputes the FULL expected pair set independently and
asserts set equality with Spark's dump plus per-row score equality.

Usage: sf1_replay_extra.py <sfdir> <outdir> [fuzzy|cosine ...]
"""
import glob
import sys

import numpy as np
import pandas as pd


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files],
                     ignore_index=True)


def lev_le1(s, t):
    if s == t:
        return 0
    ls, lt = len(s), len(t)
    if abs(ls - lt) > 1:
        return 2
    if ls == lt:  # one substitution allowed
        diff = sum(1 for a, b in zip(s, t) if a != b)
        return diff if diff <= 1 else 2
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    # one insertion: s must equal t minus one char
    i = 0
    while i < ls and s[i] == t[i]:
        i += 1
    return 1 if s[i:] == t[i + 1:] else 2


def check_fuzzy(sfdir, outdir):
    names = pd.read_parquet(f"{sfdir}/customer.parquet",
                            columns=["c_custkey", "c_name"])
    ids = names.c_custkey.astype(int).tolist()
    strs = names.c_name.astype(str).tolist()
    buckets = {}
    for i, s in zip(ids, strs):
        keys = {s} | {s[:j] + s[j + 1:] for j in range(len(s))}
        for k in keys:
            buckets.setdefault(k, []).append(i)
    byid = dict(zip(ids, strs))
    expect = {}
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                a, b = ms[x], ms[y]
                if (a, b) not in expect:
                    d = lev_le1(byid[a], byid[b])
                    if d <= 1:
                        expect[(a, b)] = d
    spark = load(outdir, "fuzzy_join_names")
    got = {(int(r.id_a), int(r.id_b)): int(r.edit_dist)
           for r in spark.itertuples(index=False)}
    miss = set(expect) - set(got)
    extra = set(got) - set(expect)
    badv = sum(1 for k in expect if k in got and got[k] != expect[k])
    ok = not miss and not extra and badv == 0
    print(f"[replay] fuzzy_join_names: expect {len(expect)} spark "
          f"{len(got)} missed {len(miss)} extra {len(extra)} "
          f"bad_dist {badv} -> {'PASS' if ok else 'FAIL'}", flush=True)
    for k in sorted(miss)[:5]:
        print(f"[replay]   MISS {k} {byid[k[0]]!r} vs {byid[k[1]]!r}")
    for k in sorted(extra)[:5]:
        print(f"[replay]   EXTRA {k}")
    return ok


def check_cosine(sfdir, outdir):
    emb = pd.read_parquet(f"{sfdir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb.vec_id.astype(int).to_numpy()
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    xn = x / norm
    n = len(ids)
    expect = {}
    blk = 2048
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        g = xn[lo:hi] @ xn.T  # (blk, n)
        for r in range(hi - lo):
            i = lo + r
            js = np.nonzero(g[r, i + 1:] >= 0.5 - 1e-12)[0] + i + 1
            for j in js:
                sc = g[r, j]
                if round(sc, 6) >= 0.5 or sc >= 0.5:
                    expect[(int(ids[i]), int(ids[j]))] = sc
    spark = load(outdir, "sim_neardup_exact")
    got = {(int(r.id_a), int(r.id_b)): float(r.score)
           for r in spark.itertuples(index=False)}
    # boundary rows: Spark filters on the unrounded score >= 0.5; the
    # replay mirrors that (1e-12 slack absorbs BLAS summation order)
    expect = {k: v for k, v in expect.items() if v >= 0.5 - 1e-12}
    miss = set(expect) - set(got)
    extra = set(got) - set(expect)
    badv = sum(1 for k, v in expect.items()
               if k in got and abs(got[k] - round(v, 6)) > 2e-6)
    ok = not miss and not extra and badv == 0
    print(f"[replay] sim_neardup_exact: expect {len(expect)} spark "
          f"{len(got)} missed {len(miss)} extra {len(extra)} "
          f"bad_score {badv} -> {'PASS' if ok else 'FAIL'}", flush=True)
    for k in sorted(miss)[:5]:
        print(f"[replay]   MISS {k} score={expect[k]:.9f}")
    for k in sorted(extra)[:5]:
        print(f"[replay]   EXTRA {k} score={got[k]:.9f}")
    return ok


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    which = sys.argv[3:] or ["fuzzy", "cosine"]
    ok = True
    if "fuzzy" in which:
        ok &= check_fuzzy(sfdir, outdir)
    if "cosine" in which:
        ok &= check_cosine(sfdir, outdir)
    print(f"[replay] {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
