#!/usr/bin/env python3
"""Assemble an interleaved A/B drift record from per-leg Bench --out files.

Usage: python3 tools/ab_drift.py <out.json> <labelA> <legA1> [legA2...] \
           -- <labelB> <legB1> [legB2...] [-- protocol text...]

Each leg file is a Bench full record ({"queries":{name:sec,...}}). The
record keeps min-of-legs per tree per query plus every raw leg, and the
B/A ratio — the same shape as AB_DRIFT_R16.json, so the cross-round
adjudication tooling reads both. Queries missing from either tree are
skipped (a tree that predates a query cannot be compared on it). A leg
where a query FAILED (Bench records -1) is excluded from that query's
min, and the exclusion is recorded per tree ("<label>_failed_legs") —
a min-of-one must never read as a two-leg probe.
"""
import json
import statistics
import sys


def main():
    out = sys.argv[1]
    rest = sys.argv[2:]
    groups, cur = [], []
    for a in rest:
        if a == "--":
            groups.append(cur)
            cur = []
        else:
            cur.append(a)
    groups.append(cur)
    (la, *fa), (lb, *fb) = groups[0], groups[1]
    # the protocol is free text: join every remaining token, or the
    # whole third group — truncating to the first shell word would
    # silently drop the capture-conditions audit trail
    protocol = " ".join(groups[2]) if len(groups) > 2 and groups[2] else (
        f"interleaved A/B {la} vs {lb}, {len(fa)}/{len(fb)} legs, "
        "min-of-legs per tree")

    def legs(files):
        return [json.load(open(f))["queries"] for f in files]

    a_legs, b_legs = legs(fa), legs(fb)
    names = sorted(set.intersection(
        *[set(l) for l in a_legs + b_legs]))
    queries = {}
    dropped = 0
    for q in names:
        av = [l[q] for l in a_legs if l[q] >= 0]
        bv = [l[q] for l in b_legs if l[q] >= 0]
        if not av or not bv:
            print(f"WARNING: {q} failed in every leg of one tree — "
                  "skipped", file=sys.stderr)
            continue
        entry = {
            f"{la}_min_s": round(min(av), 3),
            f"{lb}_min_s": round(min(bv), 3),
            "ratio": round(min(bv) / min(av), 2),
            f"{la}_legs": [round(v, 3) for v in av],
            f"{lb}_legs": [round(v, 3) for v in bv],
        }
        for lbl, got, ran in ((la, av, a_legs), (lb, bv, b_legs)):
            if len(got) < len(ran):
                entry[f"{lbl}_failed_legs"] = len(ran) - len(got)
                dropped += len(ran) - len(got)
        queries[q] = entry
    ratios = [v["ratio"] for v in queries.values()]
    rec = {
        "protocol": protocol,
        "n_queries": len(queries),
        "median_ratio": round(statistics.median(ratios), 3)
            if ratios else None,
        "faster_on_b": sum(1 for v in queries.values() if v["ratio"] < 1),
        "failed_legs_dropped": dropped,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}: {len(queries)} queries, "
          f"median {rec['median_ratio']}, "
          f"{rec['faster_on_b']} faster on {lb}, "
          f"{dropped} failed legs dropped")


if __name__ == "__main__":
    main()
