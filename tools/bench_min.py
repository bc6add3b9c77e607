#!/usr/bin/env python3
"""Merge N graft.Bench JSON artifacts into a min-of-N artifact.

The one-shot driver-shape bench is a single REPEAT=1 pass, so a
neighbor-container burst smears every query (round 12 measured a
+0.15 s/query uniform smear at host load 34 — SCALE.md). Min-of-N over
independent fresh-JVM runs is the same defense the steady artifacts
use (REPEAT=2 min), applied across processes: per-query MIN, total =
sum of mins. The merged artifact keeps every run's total and the
per-query spread so run-to-run variance is recorded, not discarded.

Usage: python3 tools/bench_min.py [--protocol "…"] out.json in1 in2 [...]
(--protocol overrides the recorded protocol string — e.g. when merging
REPEAT=2 steady runs instead of one-shot passes)
"""
import json
import sys


def main() -> None:
    argv = sys.argv[1:]
    protocol = None
    if argv and argv[0] == "--protocol":
        protocol = argv[1]
        argv = argv[2:]
    out, ins = argv[0], argv[1:]
    runs = [json.load(open(p)) for p in ins]
    names = list(runs[0]["queries"].keys())
    for r in runs[1:]:
        assert list(r["queries"].keys()) == names, "query sets differ"
    qmin, spread, flaky, attrib = {}, {}, [], {}
    for q in names:
        vals = [r["queries"][q] for r in runs]
        ok = [v for v in vals if v >= 0]
        qmin[q] = min(ok) if ok else -1.0
        if ok:
            spread[q] = round(max(ok) - min(ok), 3)
            # carry the wall/cpu/gc attribution of the winning run
            win = runs[vals.index(qmin[q])]
            if q in win.get("attrib", {}):
                attrib[q] = win["attrib"][q]
        # a query that failed in SOME runs but passed in others would
        # otherwise contribute its best passing time with no trace —
        # mark it so an intermittent crash can't hide in the min
        if ok and len(ok) < len(vals):
            flaky.append(q)
    failed = [q for q, v in qmin.items() if v < 0]
    total = round(sum(v for v in qmin.values() if v >= 0), 3)
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": {q: round(v, 3) for q, v in qmin.items()},
        "failed": failed, "flaky": flaky, "sf": runs[0]["sf"],
        "protocol": protocol or (
            f"min-of-{len(runs)} independent one-shot runs "
            "(fresh JVM each, REPEAT=1, warm-all)"),
        "run_totals": [r["value"] for r in runs],
        "max_query_spread_sec": (max(spread.values()) if spread else 0.0),
        "mean_query_spread_sec": (round(sum(spread.values()) /
                                        len(spread), 4) if spread else 0.0),
    }
    # carry every run's host block (VERDICT r17 task 1: the merged
    # steady artifact was the only perf artifact class without gateable
    # host evidence) — loadgate gates worst-of over `hosts`
    hosts = [r.get("host") for r in runs if r.get("host") is not None]
    if hosts:
        merged["hosts"] = hosts
    if attrib:
        merged["attrib"] = attrib
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"[bench_min] {len(runs)} runs {merged['run_totals']} -> "
          f"min total {total} s; mean per-query spread "
          f"{merged['mean_query_spread_sec']} s")


if __name__ == "__main__":
    main()
