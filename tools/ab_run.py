#!/usr/bin/env python3
"""Run an interleaved A/B drift probe with the leg schedule fixed BY
CONSTRUCTION, then assemble the record via tools/ab_drift.py.

Usage: python3 tools/ab_run.py <out.json> \
           <labelA> <treeDirA> <labelB> <treeDirB> \
           [--queries q1,q2,...] [--slowest N [--quiet REC.json]] \
           [--legs-per-tree 2] [--sf-dir DIR] [--workdir DIR]

The r18 lesson this tool bakes in: leg ORDERING was operator judgment —
the record needed a hand-added B-first pair to symmetrize a
monotonically-degrading load window. Here the schedule is the palindrome
A B B A (and for >2 legs per tree A B B A A B B A ...), so any monotone
box drift cancels to first order between the trees instead of crediting
whichever tree owned the quiet end of the window. Each leg is one
`graft.Bench` run in its tree's directory; Bench stamps `loadavg_entry`
into every record since r18, and the assembly lifts those stamps into
the output (`<label>_leg_loads`) next to the recorded execution order —
so monotone-window bias is data a reader can check, not memory.

Assembly always passes --first-look: the two trees' Bench versions may
retime differently (the r18 retime-skip gives an older tree more timing
attempts per leg), and adopted retimes would read as a phantom ratio
shift. Query selection defaults to the N slowest of a quiet record
(--slowest, default 30 from the newest BENCH_QUIET_r*.json beside the
newer tree) — the protocol AB_DRIFT records have carried since r16.
"""
import json
import os
import re
import subprocess
import sys


def take_opt(args, flag, default=None):
    if flag in args:
        i = args.index(flag)
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default


def newest_quiet(tree):
    cands = [f for f in os.listdir(tree)
             if re.fullmatch(r"BENCH_QUIET_r\d+\.json", f)]
    if not cands:
        sys.exit(f"no BENCH_QUIET_r*.json in {tree}; pass --quiet")
    return os.path.join(tree, max(
        cands, key=lambda n: int(re.search(r"r(\d+)", n).group(1))))


def main():
    args = sys.argv[1:]
    queries = take_opt(args, "--queries")
    slowest = int(take_opt(args, "--slowest", "30"))
    quiet = take_opt(args, "--quiet")
    legs_per_tree = int(take_opt(args, "--legs-per-tree", "2"))
    sf_dir = take_opt(args, "--sf-dir",
                      os.environ.get("SPARK_GRAFT_SF_DIR",
                                     "/root/testdata/sf0.1"))
    workdir = take_opt(args, "--workdir", "/tmp/ab_legs")
    out, la, ta, lb, tb = args[:5]
    os.makedirs(workdir, exist_ok=True)

    if queries:
        names = queries.split(",")
    else:
        rec = json.load(open(quiet or newest_quiet(tb)))
        qs = {k: v for k, v in rec["queries"].items() if v > 0}
        names = sorted(qs, key=qs.get, reverse=True)[:slowest]
    print(f"A/B over {len(names)} queries: {' '.join(names)}")

    # the palindrome schedule: A B B A (A B B A ...) — first-order
    # cancellation of monotone window drift between the trees
    half = [la, lb] if legs_per_tree % 2 == 1 else []
    sched = []
    for i in range(legs_per_tree // 2):
        sched += [la, lb, lb, la]
    sched = (half + sched) if half else sched
    counters = {la: 0, lb: 0}
    leg_files = {la: [], lb: []}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    for label in sched:
        counters[label] += 1
        tree = ta if label == la else tb
        leg = os.path.abspath(
            os.path.join(workdir, f"{label}_leg{counters[label]}.json"))
        cmd = ["sbt", "-batch",
               "runMain graft.Bench --out " + leg + " " + " ".join(names)]
        print(f"== leg {label}#{counters[label]} in {tree}", flush=True)
        r = subprocess.run(cmd, cwd=tree, env=env)
        if r.returncode != 0:
            sys.exit(f"leg {label}#{counters[label]} failed "
                     f"(exit {r.returncode})")
        leg_files[label].append(leg)

    assemble = [sys.executable,
                os.path.join(os.path.dirname(__file__), "ab_drift.py"),
                "--first-look", "--order", " ".join(sched), out,
                la, *leg_files[la], "--", lb, *leg_files[lb], "--",
                f"ABBA-scheduled interleave ({' '.join(sched)}), "
                f"{legs_per_tree} legs per tree, first looks, "
                f"min-of-legs per tree, {len(names)} slowest quiet queries"]
    r = subprocess.run(assemble)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
