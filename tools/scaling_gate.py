#!/usr/bin/env python3
"""Heavy-tail scaling gate: compare per-query bench timings between two
scale factors and report the scaling exponent of each query.

Usage: scaling_gate.py <bench_small.log> <bench_big.log> [data_ratio]

Each log is a `graft.Bench` run log containing the `{"bench_full":{...}}`
line. data_ratio defaults to 10 (sf0.1 -> sf1.0). The exponent is
log(t_big/t_small)/log(ratio): 1.0 = perfectly linear, <1 sub-linear
(fixed costs amortizing), >1 super-linear. Queries whose small-SF time
is under `floor` (default 0.3 s) are machinery-dominated and their
ratios are reported but not judged.
"""
import json
import math
import re
import sys

FLOOR = 0.3


def bench_full(path):
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"bench_full":(\{.*\})\}', line)
            if m:
                return json.loads(m.group(1))
    raise SystemExit(f"no bench_full line in {path}")


# Queries whose RESULT SIZE (not their plan) is super-linear in the
# input by construction — their wall time tracks their output, so the
# linear-work gate does not apply. Each entry must say why; a plan
# regression on these would still show as a jump vs the recorded
# exponent, which BASELINE.md tracks per round.
OUTPUT_BOUND = {
    "sim_neardup_exact": "exact all-pairs cosine — the ground-truth "
        "twin LSH recall is certified against; quadratic by definition "
        "(the scale path is sim_neardup_lsh)",
    "fuzzy_join_names": "exact-recall edit-distance-<=1 join; the true "
        "pair count grows super-linearly as the numeric name space "
        "densifies (the oracle's quadratic all-pairs agrees on output)",
    "join_null_safe": "many-to-many pair counting over 5 null-safe "
        "keys — output pairs are |cust|x|supp|/5 by construction; the "
        "query certifies <=> join semantics, not a scale path",
}


def main():
    small, big = bench_full(sys.argv[1]), bench_full(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, tb in sorted(big.items()):
        ts = small.get(name)
        if ts is None:
            continue
        exp = math.log(tb / ts) / math.log(ratio) if ts > 0 else float("nan")
        rows.append((name, ts, tb, tb / ts, exp))
    rows.sort(key=lambda r: -r[4])
    print(f"{'query':34s} {'t_small':>8s} {'t_big':>8s} {'ratio':>7s} {'exp':>6s}")
    flagged = 0
    exempted = []
    for name, ts, tb, r, e in rows:
        judged = ts >= FLOOR
        if not judged:
            flag = "  (machinery-dominated, not judged)"
        elif name in OUTPUT_BOUND:
            # only record an exemption where it actually MATTERED
            # (the query would otherwise have been judged)
            flag = "  (output-bound by design, not judged)"
            if e > 1.05:
                exempted.append(name)
        elif e > 1.05:
            flag = " <-- SUPER-LINEAR"
            flagged += 1
        else:
            flag = ""
        print(f"{name:34s} {ts:8.3f} {tb:8.3f} {r:7.2f} {e:6.2f}{flag}")
    print(f"\n{flagged} judged queries super-linear (exp > 1.05, "
          f"t_small >= {FLOOR}s); output-bound-by-design exemptions "
          f"that mattered: {sorted(exempted)}")


if __name__ == "__main__":
    main()
