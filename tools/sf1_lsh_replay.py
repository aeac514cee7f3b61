#!/usr/bin/env python3
"""Exact deterministic replay of sim_neardup_lsh's multiprobe pipeline
at sf1 — the certification that replaces the r12 measured-recall
adjudication with a bit-level oracle.

sim_neardup_lsh is approximate BY DESIGN (query-directed multiprobe
LSH, Lv et al. 2007): its output is a deterministic function of the
corpus and the spec constants, not the full exact pair set, so a
DuckDB all-pairs oracle can only measure recall. This replay instead
recomputes the ENTIRE pipeline independently and asserts the engine
emitted exactly what the spec says it must:

  1. exact-duplicate collapse (group by vector bytes, rep = min id);
  2. per-table signatures: bit p set iff dot(v, plane_p) >= 0, planes
     dumped from the JVM (graft.tools.DumpLshPlanes — HMAC-seeded
     java.util.Random gaussians; dumping avoids reimplementing
     nextGaussian, whose StrictMath rounding differs from libm by an
     ulp);
  3. query-directed probes: the 3 lowest-|margin| bits (ties -> lower
     plane index), Hamming <= 2 flips -> 7 signatures per row/table;
  4. bucket join over 8 tables with the maxBucket=1000 hot-bucket
     guard, symmetric pair normalization, candidate dedup;
  5. exact cosine on candidates, threshold 0.5 on the UNROUNDED score
     (Spark filters unrounded, then rounds to 6 for output);
  6. cross-family expansion + within-family pairs (score = the
     cosine-of-self expression, not a literal 1.0).

Float discipline: the bulk runs vectorized (numpy), whose summation
order differs from the JVM's strict left-to-right loop by ulps. Every
decision within an ulp-noise band of numpy is recomputed in exact
left-to-right Python float arithmetic (bit-identical IEEE ops to the
JVM): signature signs with |dot| < SIGN_RISK, flip-bit selection when
the 3rd/4th-smallest margins are closer than SEL_RISK, and cosine
scores within SCORE_RISK of the threshold or a 6-decimal rounding
boundary. The replay then asserts PAIR-SET EQUALITY with Spark's dump
plus per-pair rounded-score equality, and reports recall against
sim_neardup_exact's dump for the record.

Usage: sf1_lsh_replay.py <sfdir> <outdir>
"""
import glob
import json
import math
import os
import subprocess
import sys

import numpy as np
import pandas as pd

DIM = 64
TABLES = 8
FLIP_BITS = 3
THRESHOLD = 0.5
MAX_BUCKET = 1000
SIGN_RISK = 1e-8
SEL_RISK = 1e-9
SCORE_RISK = 1e-9

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files],
                     ignore_index=True)


def bits_for(n, target=64):
    # Similarity.bitsFor: max(4, ceil(log2(max(n/target, 2))))
    return max(4, math.ceil(math.log(max(n / target, 2.0)) / math.log(2.0)))


def jvm_planes(bits):
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    out = subprocess.run(
        ["java", "-cp", cp, "graft.tools.DumpLshPlanes",
         str(DIM), str(bits), str(TABLES)],
        capture_output=True, text=True, check=True).stdout
    d = json.loads(out[out.index("{"):out.rindex("}") + 1])
    return [np.array(d[f"t{t}"], dtype=np.float64) for t in range(TABLES)]


def exact_dots(vec, planes):
    """JVM-order dots: strict left-to-right accumulation per plane."""
    out = []
    for plane in planes:
        dot = 0.0
        for a, b in zip(plane, vec):
            dot += a * b
        out.append(dot)
    return out


def exact_cosine(va, vb):
    """CosineSimilarityExpr's loop: one pass, three accumulators."""
    dot = na = nb = 0.0
    for x, y in zip(va, vb):
        dot += x * y
        na += x * x
        nb += y * y
    if na == 0.0 or nb == 0.0:
        return None
    return dot / (math.sqrt(na) * math.sqrt(nb))


def choose_flips(absd, t):
    """HyperplaneProbesExpr's selection: t lowest |dot|, ties -> lower
    plane index (equivalent to stable sort by (|dot|, index))."""
    return sorted(sorted(range(len(absd)), key=lambda p: (absd[p], p))[:t])


def probe_set(sig, chosen):
    probes = {sig}
    for i, b in enumerate(chosen):
        probes.add(sig ^ (1 << b))
        for b2 in chosen[i + 1:]:
            probes.add(sig ^ (1 << b) ^ (1 << b2))
    return probes


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    emb = pd.read_parquet(f"{sfdir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb.vec_id.astype("int64").to_numpy()
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    n = len(ids)
    bits = bits_for(n)
    print(f"[lsh-replay] {n} vectors, bits={bits}", flush=True)

    # 1. exact-duplicate collapse: rep = min id per identical vector
    fam = {}
    for i in range(n):
        fam.setdefault(x[i].tobytes(), []).append(int(ids[i]))
    rep_of = {}
    members_of = {}
    for mem in fam.values():
        r = min(mem)
        members_of[r] = sorted(mem)
        for m in mem:
            rep_of[m] = r
    reps = np.array(sorted(members_of), dtype=np.int64)
    idx_of_id = {int(v): i for i, v in enumerate(ids)}
    rx = x[[idx_of_id[int(r)] for r in reps]]
    print(f"[lsh-replay] {len(reps)} distinct vectors "
          f"({n - len(reps)} exact duplicates collapsed)", flush=True)

    planes = jvm_planes(bits)
    cand = set()
    exact_rows = 0
    for t in range(TABLES):
        d = rx @ planes[t].T                      # (reps, bits)
        absd = np.abs(d)
        s = np.sort(absd, axis=1)
        risky = (absd.min(axis=1) < SIGN_RISK) | \
            (s[:, FLIP_BITS] - s[:, FLIP_BITS - 1] < SEL_RISK)
        sigs = np.zeros(len(reps), dtype=np.int64)
        order = np.argsort(absd, axis=1, kind="stable")
        probes_per_row = []
        for i in range(len(reps)):
            if risky[i]:
                ed = exact_dots(rx[i], planes[t])
                exact_rows += 1
                sig = 0
                for p, dot in enumerate(ed):
                    if dot >= 0:
                        sig |= 1 << p
                chosen = choose_flips([abs(v) for v in ed], FLIP_BITS)
            else:
                sig = int(((d[i] >= 0) << np.arange(bits)).sum())
                chosen = sorted(int(b) for b in order[i, :FLIP_BITS])
            sigs[i] = sig
            probes_per_row.append(probe_set(sig, chosen))
        # buckets over exact signatures, hot-bucket guard
        buckets = {}
        for i, sig in enumerate(sigs):
            buckets.setdefault(int(sig), []).append(int(reps[i]))
        dropped = sum(1 for m in buckets.values() if len(m) > MAX_BUCKET)
        buckets = {sig: m for sig, m in buckets.items()
                   if len(m) <= MAX_BUCKET}
        if dropped:
            print(f"[lsh-replay] t{t}: {dropped} hot buckets dropped")
        for i, probes in enumerate(probes_per_row):
            rp = int(reps[i])
            for psig in probes:
                for rs in buckets.get(psig, ()):
                    if rs != rp:
                        cand.add((rp, rs) if rp < rs else (rs, rp))
        print(f"[lsh-replay] t{t}: {len(cand)} cumulative candidate "
              f"rep pairs", flush=True)
    print(f"[lsh-replay] {exact_rows} row-tables recomputed in exact "
          f"JVM float order", flush=True)

    # 5. exact cosine on candidates, unrounded threshold
    cl = sorted(cand)
    a_idx = np.array([idx_of_id[a] for a, _ in cl])
    b_idx = np.array([idx_of_id[b] for _, b in cl])
    va, vb = x[a_idx], x[b_idx]
    dots = np.einsum("ij,ij->i", va, vb)
    na = np.einsum("ij,ij->i", va, va)
    nb = np.einsum("ij,ij->i", vb, vb)
    scores = dots / (np.sqrt(na) * np.sqrt(nb))
    rep_pairs = {}
    boundary = 0
    for k, (a, b) in enumerate(cl):
        sc = float(scores[k])
        frac = abs(sc * 1e6 - round(sc * 1e6))
        if abs(sc - THRESHOLD) < SCORE_RISK or \
                abs(frac - 0.5) < SCORE_RISK * 1e6 or \
                frac < SCORE_RISK * 1e6:
            sc = exact_cosine(x[a_idx[k]], x[b_idx[k]])
            boundary += 1
            if sc is None:
                continue
        if sc >= THRESHOLD:
            rep_pairs[(a, b)] = sc
    print(f"[lsh-replay] {len(rep_pairs)} rep pairs >= {THRESHOLD} "
          f"({boundary} boundary scores recomputed exactly)", flush=True)

    # 6. expansion: cross-family member combos + within-family pairs
    expect = {}
    for (ra, rb), sc in rep_pairs.items():
        for ma in members_of[ra]:
            for mb in members_of[rb]:
                k = (ma, mb) if ma < mb else (mb, ma)
                expect[k] = sc
    for r, mem in members_of.items():
        if len(mem) > 1:
            sc = exact_cosine(x[idx_of_id[r]], x[idx_of_id[r]])
            if sc is not None and sc >= THRESHOLD:
                for i in range(len(mem)):
                    for j in range(i + 1, len(mem)):
                        expect[(mem[i], mem[j])] = sc

    spark = load(outdir, "sim_neardup_lsh")
    got = {(int(r.id_a), int(r.id_b)): float(r.score)
           for r in spark.itertuples(index=False)}
    miss = set(expect) - set(got)
    extra = set(got) - set(expect)
    badv = sum(1 for k, v in expect.items()
               if k in got and abs(got[k] - round(v, 6)) > 2e-6)
    ok = not miss and not extra and badv == 0
    print(f"[lsh-replay] sim_neardup_lsh: replay {len(expect)} spark "
          f"{len(got)} missed {len(miss)} extra {len(extra)} "
          f"bad_score {badv} -> {'PASS' if ok else 'FAIL'}", flush=True)
    for k in sorted(miss)[:5]:
        print(f"[lsh-replay]   MISS {k} score={expect[k]:.9f}")
    for k in sorted(extra)[:5]:
        print(f"[lsh-replay]   EXTRA {k} score={got[k]:.9f}")

    # for the record: measured recall vs the exact all-pairs dump
    # (informational — LSH misses are pipeline-determined, and the
    # pipeline itself is what the assertion above certifies)
    try:
        exact = load(outdir, "sim_neardup_exact")
        exact_pairs = {(int(r.id_a), int(r.id_b))
                       for r in exact.itertuples(index=False)}
        hit = len(exact_pairs & set(got))
        fp = len(set(got) - exact_pairs)
        print(f"[lsh-replay] recall vs exact twin: {hit}/{len(exact_pairs)}"
              f" = {hit / max(len(exact_pairs), 1):.4f}, "
              f"false positives {fp}", flush=True)
    except Exception as e:
        print(f"[lsh-replay] (no exact dump for recall note: {e})")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
