#!/usr/bin/env python3
"""sf1 rows+invariants gate for the three oracles whose DuckDB form is
quadratic in the 50k-doc corpus (dedup_pairs: all-pairs shingle
jaccard; dedup_components: recursive CTE over those pairs;
dedup_elect_quality: the same CTEs plus a per-component election).

Replays the oracle semantics independently (same tokenizer:
lowercase, non-[letter|digit] runs -> space; 2-token shingles;
jaccard >= 0.7) but only where the cost is linear in the OUTPUT:

1. precision: recompute exact jaccard for every emitted pair of BOTH
   dedup_pairs (MinHash-LSH) and dedup_jaccard_exact (PPJoin); assert
   values match Spark's and clear the threshold. Full check.
2. recall of the EXACT path (stratified sample): all-pairs within
   `--sample` random docs; dedup_jaccard_exact is exact by
   construction, so its pair set within the sample must equal the
   replay exactly (zero misses, zero extras).
2b. LSH measured recall: dedup_pairs vs the full exact pair set —
   banding recall at b=16,r=4 is P(candidate|j)=1-(1-j^4)^16: a miss
   has probability 1.2e-2 at j=0.70, 5.8e-4 at j=0.78, 7.4e-6 at
   j=0.85. The protocol (the sim_neardup_lsh adjudication): zero
   extras, every miss statistically plausible under the S-curve
   (P(miss|j) >= 1e-5, i.e. j < ~0.85 — a miss of a higher-similarity
   pair would indicate a BUG, not banding), recall >= 0.999. Each
   miss prints its j and P(miss|j) for the record.
3. components: union-find over the (now verified) EXACT pair list —
   the same edge set the engine's componentsFor consumes; label = min
   doc_id of the component; assert exact equality with Spark's
   dedup_components output for all docs.
4. elect_quality: per replayed component, keep the doc with max
   n_chars (tie -> min doc_id); assert exact equality with Spark's
   dedup_elect_quality output (component, n_members, kept_doc_id,
   kept_n_chars) for all components.
5. jaccard_exact (PPJoin path): same pair semantics as dedup_pairs —
   assert the emitted pair SET is identical to dedup_pairs' (whose
   precision/recall were verified above) and recompute the unrounded
   jaccard for every emitted row.
6. split_leakfree: component = the replayed union-find label; split =
   'train' iff md5('split:'+component)[0] <= 'b'. Exact for all docs.
7. incremental (batch doc_id%10==0 vs history): full precision replay
   of every emitted (id_in, id_hist, jaccard); MEASURED recall via
   inverted index over a stratified sample of batch docs (the same
   MinHash banding as dedup_pairs => the same boundary-band protocol:
   zero extras, misses at j < 0.75, recall >= 0.999).

Usage: sf1_invariants.py <sfdir> <outdir> [--sample N]
"""
import glob
import random
import sys
import unicodedata

import pandas as pd

THRESH = 0.7


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def tokenize(text):
    # mirror regexp_replace(lower(text), '[^\p{L}\p{Nd}]+', ' ') + split
    out = []
    for ch in text.lower():
        cat = unicodedata.category(ch)
        out.append(ch if cat.startswith("L") or cat == "Nd" else " ")
    return "".join(out).split()


def shingles(text):
    toks = tokenize(text)
    if len(toks) < 3:
        return frozenset([" ".join(toks)])
    # DuckDB list slice is 1-based inclusive: toks[i:i+2] is 3 tokens
    return frozenset(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))


def jaccard(a, b):
    u = len(a | b)
    return len(a & b) / max(u, 1)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    sample_n = 2000
    if "--sample" in sys.argv:
        sample_n = int(sys.argv[sys.argv.index("--sample") + 1])

    docs = pd.read_parquet(f"{sfdir}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {int(r.doc_id): shingles(r.text)
          for r in docs.itertuples(index=False)}
    print(f"[inv] {len(sh)} docs shingled", flush=True)

    pairs = load(outdir, "dedup_pairs")
    je = load(outdir, "dedup_jaccard_exact")
    comps = load(outdir, "dedup_components")

    # 1. precision — every emitted pair of BOTH paths, exact replay
    bad = 0
    for name, frame in (("dedup_pairs", pairs), ("jaccard_exact", je)):
        nb = 0
        for r in frame.itertuples(index=False):
            j = jaccard(sh[int(r.id_a)], sh[int(r.id_b)])
            if abs(j - r.jaccard) > 1e-9 or j < THRESH                     or not r.id_a < r.id_b:
                nb += 1
                if nb <= 5:
                    print(f"[inv] BAD {name} pair ({r.id_a},{r.id_b}) "
                          f"spark={r.jaccard} replay={j}")
        print(f"[inv] precision {name}: {len(frame)} pairs replayed, "
              f"{nb} bad", flush=True)
        bad += nb

    # 2. recall — all-pairs within a random sample (inverted index to
    # skip zero-overlap pairs; a missed pair must share a shingle)
    rng = random.Random(42)
    samp = sorted(rng.sample(sorted(sh), sample_n))
    sset = set(samp)
    inv = {}
    for d in samp:
        for s in sh[d]:
            inv.setdefault(s, []).append(d)
    cand = set()
    for ds in inv.values():
        for i in range(len(ds)):
            for k in range(i + 1, len(ds)):
                cand.add((ds[i], ds[k]))
    replay = {(a, b) for a, b in cand
              if jaccard(sh[a], sh[b]) >= THRESH}
    je_pairs = {(int(r.id_a), int(r.id_b))
                for r in je.itertuples(index=False)}
    je_in_samp = {(a, b) for a, b in je_pairs
                  if a in sset and b in sset}
    miss, extra = replay - je_in_samp, je_in_samp - replay
    print(f"[inv] exact-path recall sample n={sample_n}: replay "
          f"{len(replay)} spark {len(je_in_samp)} missed {len(miss)} "
          f"extra {len(extra)}", flush=True)

    # 2b. LSH measured recall — dedup_pairs vs the FULL exact set
    dp_pairs = {(int(r.id_a), int(r.id_b))
                for r in pairs.itertuples(index=False)}
    lsh_extra = dp_pairs - je_pairs
    lsh_miss = je_pairs - dp_pairs
    lsh_recall = 1 - len(lsh_miss) / max(len(je_pairs), 1)
    boundary_ok = True
    for a, b in sorted(lsh_miss):
        j = jaccard(sh[a], sh[b])
        pmiss = (1 - j ** 4) ** 16
        if pmiss < 1e-5:
            boundary_ok = False
        print(f"[inv] LSH miss ({a},{b}) j={j:.6f} P(miss|j)={pmiss:.2e}"
              f"{'' if pmiss >= 1e-5 else '  <-- IMPLAUSIBLE: bug?'}")
    lsh_ok = not lsh_extra and lsh_recall >= 0.999 and boundary_ok
    print(f"[inv] LSH recall: {len(dp_pairs)}/{len(je_pairs)} pairs = "
          f"{lsh_recall:.6f}, extras {len(lsh_extra)}, misses "
          f"{len(lsh_miss)} (all in boundary band: {boundary_ok})",
          flush=True)

    # 3. components — union-find over the verified EXACT pair list
    # (the same edge set the engine's componentsFor consumes)
    pairs = je
    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples(index=False):
        ra, rb = find(int(r.id_a)), find(int(r.id_b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {}
    for d in sh:
        root = find(d)
        label[d] = min(label.get(root, d), d) if root in label else root
    # min-label: root is already the min because union keeps the min id
    cc_bad = 0
    for r in comps.itertuples(index=False):
        if find(int(r.doc_id)) != int(r.component):
            cc_bad += 1
            if cc_bad <= 5:
                print(f"[inv] BAD component doc={r.doc_id} "
                      f"spark={r.component} replay={find(int(r.doc_id))}")
    n_comp_spark = comps["component"].nunique()
    n_comp_replay = len({find(d) for d in sh})
    print(f"[inv] components: {len(comps)} rows, {cc_bad} bad labels; "
          f"spark {n_comp_spark} components, replay {n_comp_replay}",
          flush=True)

    # 4. elect_quality — replay the per-component election over the
    # verified components (keep max n_chars, tie -> min doc_id)
    nchars = dict(zip(
        pd.read_parquet(f"{sfdir}/documents.parquet",
                        columns=["doc_id", "n_chars"]).doc_id.astype(int),
        pd.read_parquet(f"{sfdir}/documents.parquet",
                        columns=["doc_id", "n_chars"]).n_chars.astype(int)))
    members = {}
    for d in sh:
        members.setdefault(find(d), []).append(d)
    expect = {}
    for root, ds in members.items():
        kept = min(ds, key=lambda d: (-nchars[d], d))
        expect[root] = (len(ds), kept, nchars[kept])
    elect = load(outdir, "dedup_elect_quality")
    eq_bad = 0
    for r in elect.itertuples(index=False):
        exp = expect.get(int(r.component))
        got = (int(r.n_members), int(r.kept_doc_id), int(r.kept_n_chars))
        if exp != got:
            eq_bad += 1
            if eq_bad <= 5:
                print(f"[inv] BAD elect comp={r.component} "
                      f"spark={got} replay={exp}")
    print(f"[inv] elect_quality: {len(elect)} rows vs {len(expect)} "
          f"replayed components, {eq_bad} bad", flush=True)

    # 5. jaccard_exact precision was replayed in (1); its sampled
    # recall in (2); LSH containment in (2b).

    # 6. split_leakfree — component label + md5 split replay
    import hashlib
    sl = load(outdir, "split_leakfree")
    sl_bad = 0
    for r in sl.itertuples(index=False):
        comp = find(int(r.doc_id))
        want = "train" if hashlib.md5(
            f"split:{comp}".encode()).hexdigest()[0] <= "b" else "val"
        if int(r.component) != comp or r.split != want:
            sl_bad += 1
            if sl_bad <= 5:
                print(f"[inv] BAD split doc={r.doc_id} "
                      f"spark=({r.component},{r.split}) "
                      f"replay=({comp},{want})")
    print(f"[inv] split_leakfree: {len(sl)} rows, {sl_bad} bad", flush=True)

    # 7. incremental — full precision; recall on sampled batch docs
    inc = load(outdir, "dedup_incremental")
    inc_bad = 0
    for r in inc.itertuples(index=False):
        a, b2 = int(r.id_in), int(r.id_hist)
        j = jaccard(sh[a], sh[b2])
        if (abs(j - r.jaccard) > 5e-7 or j < THRESH
                or a % 10 != 0 or b2 % 10 == 0):
            inc_bad += 1
            if inc_bad <= 5:
                print(f"[inv] BAD incr ({a},{b2}) spark={r.jaccard} "
                      f"replay={j}")
    batch = [d for d in sh if d % 10 == 0]
    bs = set(rng.sample(batch, min(1000, len(batch))))
    hist_inv = {}
    for d in sh:
        if d % 10 != 0:
            for s in sh[d]:
                hist_inv.setdefault(s, []).append(d)
    inc_replay = set()
    for a in bs:
        cands = set()
        for s in sh[a]:
            cands.update(hist_inv.get(s, ()))
        for b2 in cands:
            if jaccard(sh[a], sh[b2]) >= THRESH:
                inc_replay.add((a, b2))
    inc_spark_s = {(int(r.id_in), int(r.id_hist))
                   for r in inc.itertuples(index=False)
                   if int(r.id_in) in bs}
    inc_miss = inc_replay - inc_spark_s
    inc_extra = inc_spark_s - inc_replay
    inc_recall = 1 - len(inc_miss) / max(len(inc_replay), 1)
    inc_boundary = True
    for a, b2 in sorted(inc_miss):
        j = jaccard(sh[a], sh[b2])
        pmiss = (1 - j ** 4) ** 16
        if pmiss < 1e-5:
            inc_boundary = False
        print(f"[inv] incr miss ({a},{b2}) j={j:.6f} "
              f"P(miss|j)={pmiss:.2e}"
              f"{'' if pmiss >= 1e-5 else '  <-- IMPLAUSIBLE: bug?'}")
    inc_ok = not inc_extra and inc_recall >= 0.999 and inc_boundary
    print(f"[inv] incremental: {len(inc)} rows, {inc_bad} bad; recall "
          f"sample {len(bs)} batch docs: replay {len(inc_replay)} spark "
          f"{len(inc_spark_s)} missed {len(inc_miss)} extra "
          f"{len(inc_extra)} recall {inc_recall:.6f} boundary "
          f"{inc_boundary}", flush=True)

    ok = bad == 0 and not miss and not extra and cc_bad == 0 \
        and len(comps) == len(sh) and n_comp_spark == n_comp_replay \
        and eq_bad == 0 and len(elect) == len(expect) \
        and lsh_ok and sl_bad == 0 and len(sl) == len(sh) \
        and inc_bad == 0 and inc_ok
    print(f"[inv] {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
