#!/usr/bin/env python3
"""Merge fuzz_report.json fragments from parallel seed-range runs of
tools/fuzz.py (written via FUZZ_REPORT_OUT) into one committed artifact
with the same schema.

Usage: python3 tools/merge_fuzz.py frag1.json frag2.json ... out.json
"""
import json
import sys


def main():
    *frag_paths, out_path = sys.argv[1:]
    frags = []
    for p in frag_paths:
        with open(p) as f:
            frags.append(json.load(f))
    modes = {f["mode"] for f in frags}
    assert len(modes) == 1, f"mixed modes: {modes}"
    seeds = {}
    for f in frags:
        dup = seeds.keys() & f["seeds"].keys()
        assert not dup, f"duplicate seeds across fragments: {sorted(dup)}"
        seeds.update(f["seeds"])
    bad = [s for s, r in seeds.items() if not r["ok"]]
    report = {
        "mode": modes.pop(),
        "n_queries": max(len(r["pass"]) + len(r["fail"])
                         for r in seeds.values()),
        "seeds": {s: seeds[s] for s in sorted(seeds, key=int)},
        "clean": len(seeds) - len(bad),
        "total": len(seeds),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"[merge] {report['clean']}/{report['total']} seeds clean -> "
          f"{out_path}" + (f"; divergent: {sorted(bad, key=int)}"
                           if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
