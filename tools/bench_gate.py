#!/usr/bin/env python3
"""Per-round bench regression gate — automates the comparison the
judge previously ran by hand each round.

Usage:
  python3 tools/bench_gate.py <current_bench.json> <prior_bench.json> \
      [band_file=tools/bench_band.json]

Gates (exit 1 on any failure):
  1. zero bench errors (errors never fold into timings)
  2. total within the recorded ambient band (tools/bench_band.json —
     this box drifts run-to-run on an unchanged binary, so totals are
     judged against the band, not a single anchor). A total ABOVE the
     band fails; a total BELOW it passes with a notice to update the
     band file deliberately.
  3. per-query: no query in the compact summary (headline set +
     slowest-5) exceeds 2x its prior-round time, with a 0.3 s absolute
     floor so sub-100 ms queries' jitter cannot trip the ratio. The
     bench already strips single-pass noise by re-timing the heavy
     tail and keeping the min ("retimed"), so a 2x excess here is a
     real regression, not scheduler luck.

The band file is updated DELIBERATELY (edit it in the same commit
that justifies the shift), never automatically.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def queries_of(bench):
    q = dict(bench.get("queries", {}))
    slow = bench.get("slowest", {})
    if isinstance(slow, dict):
        q.update(slow)
    return q


def main():
    cur = load(sys.argv[1])
    prior = load(sys.argv[2])
    band_file = sys.argv[3] if len(sys.argv) > 3 else "tools/bench_band.json"
    band = load(band_file)
    failures = []
    notices = []

    n_err = cur.get("n_errors", len(cur.get("errors", {})))
    if n_err:
        failures.append(f"{n_err} bench errors: {cur.get('errors')}")

    total = cur["value"]
    if total > band["hi"]:
        failures.append(
            f"total {total}s above the ambient band "
            f"[{band['lo']}, {band['hi']}] — regression, or update "
            f"{band_file} deliberately")
    elif total < band["lo"]:
        notices.append(
            f"total {total}s BELOW the ambient band "
            f"[{band['lo']}, {band['hi']}] — if repeatable, lower the "
            f"band deliberately")

    cq, pq = queries_of(cur), queries_of(prior)
    for name in sorted(set(cq) & set(pq)):
        c, p = cq[name], pq[name]
        if c > 2 * p and c - p > 0.3:
            ratio = f"{c / p:.2f}x" if p > 0 else "inf"
            failures.append(
                f"query {name}: {c:.3f}s vs prior {p:.3f}s "
                f"({ratio}) exceeds the 2x per-query gate")

    verdict = {
        "gate": "bench",
        "total": total,
        "band": [band["lo"], band["hi"]],
        "prior_total": prior.get("value"),
        "queries_compared": len(set(cq) & set(pq)),
        "failures": failures,
        "notices": notices,
        "result": "FAIL" if failures else "PASS",
    }
    print(json.dumps(verdict))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
