#!/usr/bin/env python3
"""Scale-validation analysis: per-query wall-time ratios between two Bench
records (sf0.1 vs sf1, 10x data) -> BENCH_SCALE.json.

A query scaling linearly with data should cost ~10x; fixed per-query
overhead (session, store round-trips, node-sized iterations) pulls real
ratios well below that at these absolute sizes. Ratios ABOVE the flag
threshold mark candidate superlinear plans for re-audit (or sub-second
base times where the ratio is mostly noise -- both are listed, the
analyst separates them in SCALING.md).

Usage: python3 tools/scale_ratio.py <bench_small.json> <bench_big.json>
           <data_factor> <out.json> [flag_ratio]
"""
import json
import sys


def main():
    small_f, big_f, factor, out_f = sys.argv[1:5]
    factor = float(factor)
    flag = float(sys.argv[5]) if len(sys.argv) > 5 else 1.2 * factor
    small = json.load(open(small_f))["queries"]
    big = json.load(open(big_f))["queries"]
    rows = {}
    for name, t1 in sorted(small.items()):
        t10 = big.get(name)
        if t10 is None or t1 < 0 or t10 < 0:
            rows[name] = {"small_s": t1, "big_s": t10, "ratio": None,
                          "flag": "missing-or-failed"}
            continue
        if t1 == 0:
            # a zero base makes the ratio undefined -- flag the one query
            # instead of crashing the whole analysis
            rows[name] = {"small_s": 0.0, "big_s": round(t10, 3),
                          "ratio": None, "flag": "zero-base"}
            continue
        ratio = t10 / t1
        entry = {"small_s": round(t1, 3), "big_s": round(t10, 3),
                 "ratio": round(ratio, 2)}
        if ratio > flag:
            entry["flag"] = ("noise-base" if t1 < 0.3 else "superlinear?")
        rows[name] = entry
    flagged = {k: v for k, v in rows.items() if "flag" in v}
    summary = {
        "data_factor": factor,
        "flag_threshold": flag,
        "n_queries": len(rows),
        "total_small_s": round(sum(v["small_s"] for v in rows.values()
                                   if v.get("small_s", -1) >= 0), 1),
        "total_big_s": round(sum(v["big_s"] for v in rows.values()
                                 if (v.get("big_s") or -1) >= 0), 1),
        "n_flagged": len(flagged),
        "flagged": {k: v for k, v in sorted(
            flagged.items(), key=lambda kv: -(kv[1].get("ratio") or 0))},
        "queries": rows,
    }
    json.dump(summary, open(out_f, "w"), indent=1)
    print(f"wrote {out_f}: {len(rows)} queries, "
          f"{summary['total_small_s']}s -> {summary['total_big_s']}s, "
          f"{len(flagged)} flagged (> {flag:.1f}x)")
    for k, v in summary["flagged"].items():
        print(f"  {k}: {v['small_s']}s -> {v['big_s']}s "
              f"({v['ratio']}x, {v['flag']})")


if __name__ == "__main__":
    main()
