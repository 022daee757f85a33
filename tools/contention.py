#!/usr/bin/env python3
"""Concurrent-board contention analysis: per-query wall-time ratios between
a serial Bench record and one or more `--threads N` records ->
BENCH_CONCURRENT.json.

With N query threads sharing one local[C] session, a query's wall time
under contention is expected to grow toward N x (slot sharing: the
scheduler divides the same C cores among N concurrent job DAGs). Ratios
well ABOVE the thread count mark interference beyond fair sharing --
shared driver locks, registry/factory serialization, broadcast-cleanup
stalls, storage churn -- the defect class plan audits cannot see.

Usage: python3 tools/contention.py <serial.json> <out.json> \
           <threads:concurrent.json> [<threads:concurrent.json> ...] \
           [--reruns reruns.json]

reruns.json ({name: {"threads": N, "rerun_s": s, "for_concurrent_s": s,
"for_serial_s": s}} -- all fields required; a record lacking
"for_serial_s" is voided, never silently half-checked) carries
SAME-WIDTH re-runs of flagged queries as
checked adjudication evidence: an over-fair-share flag whose same-width
rerun lands back inside the fair-share envelope was a one-off
scheduling spike (the iterative-query pattern: each CC/k-means round
re-queues behind the full board, so one unlucky interleaving inflates
one timing), not a lock -- a lock reproduces. The evidence is tied to
the measurement PAIR it explains: if the current concurrent_s has grown
past "for_concurrent_s", or the current serial base has moved outside
"for_serial_s"'s tolerance band in either direction (a shrunken serial
base inflates the current ratio just as a grown concurrent side does),
the rerun is STALE and the flag stands.
"""
import json
import sys

# Standing adjudications: queries whose over-fair-share ratio has been
# investigated and attributed to something other than a shared lock.
# They are still listed in "flagged" (annotated, auditable) but do not
# count toward n_flagged, so a known-benign shape stops consuming review
# attention every round. Add entries only with the evidence inline.
# Each adjudication's evidence claim is CHECKED against the records it
# suppresses: these entries all rest on "absolute concurrent cost is
# flat across widths", so if the widest run's concurrent_s exceeds the
# narrowest's by more than FLATNESS_TOLERANCE the suppression is
# voided and the query re-flags as interference -- a later real lock
# cannot hide behind a stale adjudication.
ADJUDICATED = {
    "q_bloom_prefilter":
        "cold bits-broadcast build straddles the concurrent board's scans; "
        "absolute concurrent cost is FLAT across widths (r11/r12: ~3.7s at "
        "both t4 and t8 - a lock would grow with threads), so this is slot "
        "sharing on the broadcast-build jobs, not interference",
}
FLATNESS_TOLERANCE = 1.5


def adjudication_holds(name, runs):
    """The flatness evidence, re-checked: concurrent cost at the widest
    width must not exceed the narrowest by more than the tolerance."""
    pts = sorted((n, rec["queries"].get(name))
                 for n, rec in runs if rec["queries"].get(name, -1) > 0)
    if len(pts) < 2:
        return True  # one width: nothing to check against
    return pts[-1][1] <= pts[0][1] * FLATNESS_TOLERANCE


RERUN_STALENESS_TOLERANCE = 1.25


def main():
    serial_f, out_f = sys.argv[1:3]
    serial = json.load(open(serial_f))
    args = sys.argv[3:]
    reruns = {}
    if "--reruns" in args:
        i = args.index("--reruns")
        reruns = json.load(open(args[i + 1]))
        args = args[:i] + args[i + 2:]
    runs = []
    for spec in args:
        n, f = spec.split(":", 1)
        runs.append((int(n), json.load(open(f))))
    base = serial["queries"]
    report = {"serial_total_s": round(serial["value"], 1),
              "serial_loadavg_start": serial.get("loadavg_start"),
              "runs": []}
    for n, rec in runs:
        qs = rec["queries"]
        ratios = {}
        for name, t1 in sorted(base.items()):
            tc = qs.get(name)
            if tc is None or t1 is None or t1 <= 0 or tc < 0:
                ratios[name] = {"serial_s": t1, "concurrent_s": tc,
                                "ratio": None, "flag": "missing-or-failed"}
                continue
            r = tc / t1
            entry = {"serial_s": round(t1, 3), "concurrent_s": round(tc, 3),
                     "ratio": round(r, 2)}
            # interference = beyond 2x the fair-share expectation, on a
            # base big enough that the ratio is not scheduler noise
            if r > 2.0 * n and t1 >= 0.3:
                if name in ADJUDICATED and adjudication_holds(name, runs):
                    entry["flag"] = "adjudicated"
                    entry["adjudication"] = ADJUDICATED[name]
                elif name in ADJUDICATED:
                    entry["flag"] = "interference?"
                    entry["adjudication_voided"] = (
                        "flatness evidence violated: concurrent cost grew "
                        f">{FLATNESS_TOLERANCE}x from the narrowest to the "
                        "widest run")
                else:
                    entry["flag"] = "interference?"
                # same-width rerun as CHECKED adjudication evidence: a
                # lock reproduces; a one-off scheduling spike does not
                if (entry["flag"] == "interference?" and name in reruns
                        and reruns[name].get("threads") == n):
                    rec_r = reruns[name]
                    # preserve any standing-adjudication voiding message:
                    # the rerun is independent evidence and may still
                    # adjudicate, but the artifact IS the audit trail
                    if "adjudication_voided" in entry:
                        entry["standing_adjudication_voided"] = (
                            entry.pop("adjudication_voided"))
                    tol = RERUN_STALENESS_TOLERANCE
                    # EVERY required field is validated up front: a
                    # record missing any of them is voided on the entry
                    # (the same handling for_serial_s always had), never
                    # half-checked -- a bare KeyError here would abort
                    # the whole analysis for one malformed record
                    missing = [k for k in ("rerun_s", "for_concurrent_s",
                                           "for_serial_s")
                               if k not in rec_r]
                    rr = float(rec_r["rerun_s"]) if "rerun_s" in rec_r \
                        else None
                    for_c = (float(rec_r["for_concurrent_s"])
                             if "for_concurrent_s" in rec_r else None)
                    if rr is not None:
                        entry["rerun_s"] = round(rr, 3)
                        entry["rerun_ratio"] = round(rr / t1, 2)
                    if missing:
                        entry["adjudication_voided"] = (
                            "rerun record lacks required field(s) "
                            + ", ".join(missing) + " -- the staleness "
                            "checks cannot run; re-record the evidence "
                            "in full (rerun_s, for_concurrent_s, "
                            "for_serial_s)")
                    elif tc > for_c * tol:
                        entry["adjudication_voided"] = (
                            f"rerun evidence is STALE: it adjudicated a "
                            f"{for_c:.2f}s measurement but the current "
                            f"concurrent_s is {tc:.2f}s -- re-run at this "
                            "width before suppressing")
                    elif not (float(rec_r["for_serial_s"]) / tol <= t1
                              <= float(rec_r["for_serial_s"]) * tol):
                        entry["adjudication_voided"] = (
                            f"rerun evidence is STALE on the SERIAL side: "
                            f"it adjudicated a "
                            f"{float(rec_r['for_serial_s']):.2f}s base but "
                            f"the current serial_s is {t1:.2f}s (outside "
                            f"the {tol}x band) -- re-measure before "
                            "suppressing")
                    elif rr / t1 <= 2.0 * n:
                        entry["flag"] = "adjudicated"
                        entry["adjudication"] = (
                            f"same-width rerun landed at {rr:.2f}s "
                            f"({rr / t1:.2f}x, inside the {2.0 * n:.0f}x "
                            "fair-share envelope): a one-off scheduling "
                            "spike, not a lock -- a lock reproduces")
                    else:
                        entry["adjudication_voided"] = (
                            f"same-width rerun {rr:.2f}s ({rr / t1:.2f}x) "
                            "CONFIRMS the flag -- reproducible, not noise")
            elif r > 2.0 * n:
                entry["flag"] = "noise-base"
            ratios[name] = entry
        vals = [v["ratio"] for v in ratios.values() if v["ratio"] is not None]
        vals.sort()
        flagged = {k: v for k, v in sorted(
            ratios.items(), key=lambda kv: -(kv[1].get("ratio") or 0))
            if "flag" in v}
        report["runs"].append({
            "threads": n,
            "wall_s": round(rec["value"], 1),
            "sum_query_s": round(rec.get("sum_query_s", -1), 1),
            "speedup_vs_serial_wall": round(serial["value"] / rec["value"], 2),
            "median_ratio": round(vals[len(vals) // 2], 2) if vals else None,
            "p90_ratio": round(vals[int(len(vals) * 0.9)], 2) if vals else None,
            "n_flagged": sum(1 for v in flagged.values()
                             if v["flag"] == "interference?"),
            "flagged": flagged,
            "queries": ratios,
        })
    json.dump(report, open(out_f, "w"), indent=1)
    for r in report["runs"]:
        print(f"threads={r['threads']}: wall {r['wall_s']}s "
              f"(speedup {r['speedup_vs_serial_wall']}x), "
              f"median ratio {r['median_ratio']}x, p90 {r['p90_ratio']}x, "
              f"{r['n_flagged']} interference flags")
        for k, v in r["flagged"].items():
            if v.get("flag") == "interference?":
                print(f"  {k}: {v['serial_s']}s -> {v['concurrent_s']}s "
                      f"({v['ratio']}x)")
            elif v.get("flag") == "adjudicated":
                print(f"  {k}: {v['serial_s']}s -> {v['concurrent_s']}s "
                      f"({v['ratio']}x) [adjudicated: benign]")


if __name__ == "__main__":
    main()
