#!/usr/bin/env python3
"""Min-merge Bench artifacts into a committed floor artifact.

Usage: merge_bench.py OUT.json LEG1.json LEG2.json [...]

Per query: the minimum non-negative elapsed across legs (negative
entries are Bench's failed-query sentinel and never win; if every leg
failed a query, the slowest sentinel is kept so the failure stays
visible). The merged artifact carries, per leg, the run-level
stealFrac and canarySec (null for legs that predate BoxCanary), the
per-query steal measured in the leg that WON that query, and
`mergedFrom` naming the legs — so the floor's own window speed is
auditable from the one committed file.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, legs = sys.argv[1], sys.argv[2:]
    runs = []
    for p in legs:
        with open(p) as f:
            runs.append(json.load(f))
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            sys.exit(f"leg query sets differ: {sorted(set(r['queries']) ^ names)}")
    queries, steal = {}, {}
    for q in sorted(names):
        entries = [(r["queries"][q], r.get("steal", {}).get(q)) for r in runs]
        good = [e for e in entries if e[0] >= 0]
        win = min(good, key=lambda e: e[0]) if good else min(entries, key=lambda e: e[0])
        queries[q], steal[q] = win
    total = sum(v for v in queries.values() if v >= 0)
    # leg labels: runA, runB, ... in argument order
    labels = [f"run{chr(ord('A') + i)}" for i in range(len(legs))]
    merged = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "action": runs[0].get("action", "count"),
        "sf": runs[0].get("sf"),
        "stealFrac": [r.get("stealFrac") for r in runs],
        "steal": steal,
        "canarySec": {l: r.get("canarySec") for l, r in zip(labels, runs)},
        "passes": [r.get("passes", 2) for r in runs],
        "mergedFrom": [p.split("/")[-1] for p in legs],
        "queries": queries,
    }
    acts = {r.get("action", "count") for r in runs}
    if len(acts) > 1:
        sys.exit(f"refusing to merge mixed actions: {acts}")
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"{out}: total={total:.2f} over {len(names)} queries from {len(legs)} legs")


if __name__ == "__main__":
    main()
