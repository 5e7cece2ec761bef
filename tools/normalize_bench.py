#!/usr/bin/env python3
"""Normalize a Bench artifact's total by the committed canary reference.

Usage: normalize_bench.py BENCH.json [BENCH2.json ...]

For each artifact, reads the run's canarySec.oneCore samples (a raw leg
carries [start, end]; a merged artifact carries per-leg objects, of
which the non-null ones are averaged) and prints the box-speed ratio
against CANARY.json's reference plus the normalized total:

    normalized = total * (reference.oneCoreSec / mean(run oneCore))

This is the mechanical form of the rule in CANARY.json / BASELINE.md's
round-11 addendum: a cross-window total must be window-corrected before
being called a regression. An artifact with no canary fields (pre
round-11) is reported as such — it cannot be normalized.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def one_core_samples(canary):
    """Flatten a raw-leg or merged canarySec field to oneCore samples.

    End samples are trusted only in the round-13 "post-stop-stable"
    regime (two consecutive post-stop readings agreed): older artifacts'
    end samples were taken inside the live session or before the
    retry-until-stable fix and read hot under the sbt harness (r12
    driver artifact: end 1.935 vs start 1.108) — for those, only the
    START sample measures the box.
    """
    if canary is None:
        return []
    if "oneCore" in canary:  # raw leg: {"oneCore": [s, e], "allCores": [...]}
        ones = list(canary["oneCore"])
        if canary.get("mode") == "post-stop-stable" and canary.get("endStable"):
            return ones
        return ones[:1]
    # merged: {"runA": null, "runD": {"oneCore": [...], ...}, ...}
    out = []
    for leg in canary.values():
        if leg is not None:
            out.extend(one_core_samples(leg))
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    with open(os.path.join(HERE, "..", "CANARY.json")) as f:
        ref = json.load(f)["reference"]["oneCoreSec"]
    for path in sys.argv[1:]:
        with open(path) as f:
            art = json.load(f)
        # driver-side artifacts (BENCH_r{N}.json) wrap the bench line
        if "value" not in art and isinstance(art.get("parsed"), dict):
            art = art["parsed"]
        if "value" not in art:
            print(f"{os.path.basename(path)}: no total (not a Bench artifact, "
                  f"or driver wrapper with unparsed tail) — skipped")
            continue
        total = art["value"]
        samples = one_core_samples(art.get("canarySec"))
        name = os.path.basename(path)
        if not samples:
            print(f"{name}: total={total:.2f}s, no canary fields — cannot normalize")
            continue
        mean = sum(samples) / len(samples)
        ratio = ref / mean
        print(
            f"{name}: total={total:.2f}s oneCore={mean:.4f}s "
            f"(ref {ref:.4f}) boxRatio={ratio:.4f} normalized={total * ratio:.2f}s"
        )


if __name__ == "__main__":
    main()
