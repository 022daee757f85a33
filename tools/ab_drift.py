#!/usr/bin/env python3
"""Assemble an interleaved A/B drift record from per-leg Bench --out files.

Usage: python3 tools/ab_drift.py [--first-look] <out.json> \
           <labelA> <legA1> [legA2...] \
           -- <labelB> <legB1> [legB2...] [-- protocol text...]

--first-look strips retime ADOPTIONS from every leg before comparing
(each leg's "retimed" trail carries {first, retime, adopted}; adopted
entries are reverted to their first look). Use it whenever the two
trees' Bench versions retime differently — r18's quiet-confirmed
retime skip gives the OLDER tree more timing attempts per leg, which
reads as a phantom ratio shift if raw (post-retime) numbers are
compared.

Each leg file is a Bench full record ({"queries":{name:sec,...}}). The
record keeps min-of-legs per tree per query plus every raw leg, and the
B/A ratio — the same shape as AB_DRIFT_R16.json, so the cross-round
adjudication tooling reads both.

Leg coverage is per query, not per file: a query is compared when SOME
leg of each tree ran it, so third-leg RE-PROBE files covering only the
suspect queries fold into the same assembly (their rows simply carry 3
entries in the `_legs` arrays). A query probed with >2 legs on either
side also records `ratio_first2` — the ratio the first two legs alone
would have produced — emitted only when BOTH trees have two valid
first legs (a failed first leg would silently turn it into a
min-of-one ratio; such rows carry `ratio_first2_partial` instead).
Queries present in one tree's legs but not the other's are recorded in
`skipped_missing`; queries skipped for a zero-second leg timing are
recorded in `skipped_zero` (neither is silently dropped — the record
is the artifact readers audit). A leg where a query FAILED (Bench
records -1) is excluded from that query's min, and the exclusion is
recorded per tree ("<label>_failed_legs").

Every leg's capture conditions ride into the record: `<label>_leg_loads`
carries each leg file's `loadavg_entry` (the box load the gate actually
enforced), so a monotone-load window is visible as data instead of
operator memory. `--order "A B B A"` records the EXECUTION order of the
legs (tokens are tree labels in run sequence — the ABBA interleave
tools/ab_run.py emits by construction); without it the record says
`"leg_order": "unrecorded"` so an assembled-by-hand record is
distinguishable from a protocol-scheduled one.
"""
import json
import statistics
import sys


def main():
    args = sys.argv[1:]
    first_look = "--first-look" in args
    if first_look:
        args = [a for a in args if a != "--first-look"]
    leg_order = "unrecorded"
    if "--order" in args:
        i = args.index("--order")
        leg_order = args[i + 1].split()
        args = args[:i] + args[i + 2:]
    out = args[0]
    rest = args[1:]
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
        out, loads = [], []
        for f in files:
            rec = json.load(open(f))
            qs = dict(rec["queries"])
            if first_look:
                for name, t in rec.get("retimed", {}).items():
                    if t.get("adopted") and name in qs:
                        qs[name] = t["first"]
            out.append(qs)
            loads.append(rec.get("loadavg_entry"))
        return out, loads

    (a_legs, a_loads), (b_legs, b_loads) = legs(fa), legs(fb)
    a_names = set().union(*[set(l) for l in a_legs])
    b_names = set().union(*[set(l) for l in b_legs])
    names = sorted(a_names & b_names)
    skipped_missing = sorted(a_names ^ b_names)
    if skipped_missing:
        print(f"WARNING: {len(skipped_missing)} queries present in only "
              f"one tree's legs, skipped: {', '.join(skipped_missing)}",
              file=sys.stderr)
    queries = {}
    dropped = 0
    skipped_zero = []
    for q in names:
        # leg order is file order — the interleave order the runner used,
        # so "first two" below means the original 2-leg probe
        a_present = [l[q] for l in a_legs if q in l]
        b_present = [l[q] for l in b_legs if q in l]
        av = [v for v in a_present if v >= 0]
        bv = [v for v in b_present if v >= 0]
        if not av or not bv:
            print(f"WARNING: {q} failed in every leg of one tree — "
                  "skipped", file=sys.stderr)
            continue
        if min(av) == 0 or min(bv) == 0:
            print(f"WARNING: {q} has a zero-second leg timing — "
                  "skipped rather than divided by", file=sys.stderr)
            skipped_zero.append(q)
            continue
        entry = {
            f"{la}_min_s": round(min(av), 3),
            f"{lb}_min_s": round(min(bv), 3),
            "ratio": round(min(bv) / min(av), 2),
            f"{la}_legs": [round(v, 3) for v in av],
            f"{lb}_legs": [round(v, 3) for v in bv],
        }
        if len(av) > 2 or len(bv) > 2:
            a2 = [v for v in a_present[:2] if v > 0]
            b2 = [v for v in b_present[:2] if v > 0]
            # only an honest two-vs-two comparison gets the documented
            # name: a failed first leg would silently make this a
            # min-of-one ratio, so it is labeled partial instead
            if len(a2) == 2 and len(b2) == 2:
                entry["ratio_first2"] = round(min(b2) / min(a2), 2)
            elif a2 and b2:
                entry["ratio_first2_partial"] = round(min(b2) / min(a2), 2)
        for lbl, got, present in ((la, av, a_present), (lb, bv, b_present)):
            if len(got) < len(present):
                entry[f"{lbl}_failed_legs"] = len(present) - len(got)
                dropped += len(present) - len(got)
        queries[q] = entry
    ratios = [v["ratio"] for v in queries.values()]
    rec = {
        "protocol": protocol,
        "leg_order": leg_order,
        f"{la}_leg_loads": a_loads,
        f"{lb}_leg_loads": b_loads,
        "n_queries": len(queries),
        "median_ratio": round(statistics.median(ratios), 3)
            if ratios else None,
        "faster_on_b": sum(1 for v in queries.values() if v["ratio"] < 1),
        "failed_legs_dropped": dropped,
        "skipped_missing": skipped_missing,
        "skipped_zero": skipped_zero,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}: {len(queries)} queries, "
          f"median {rec['median_ratio']}, "
          f"{rec['faster_on_b']} faster on {lb}, "
          f"{dropped} failed legs dropped, "
          f"{len(skipped_missing)} skipped missing")


if __name__ == "__main__":
    main()
