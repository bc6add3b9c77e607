#!/usr/bin/env python3
"""Flag bench/soak artifacts whose measurement window was contended.

Usage: python3 tools/loadgate.py <artifact.json> [...]

Reads the `host` block Bench/Soak/StreamSinkExperiment embed (VERDICT r16
task 4: two rounds of perf adjudication were burned on external box load)
and the per-query `load1` samples in Bench's `attrib`, and prints a
verdict per artifact:

  CLEAN     — adjudicate the numbers as plan costs
  CONTENDED — external load or hypervisor steal inside the window; the
              numbers are upper bounds, never regressions. Re-run in a
              quiet window before adjudicating.

Thresholds (tuned to this box's observed failure modes, overridable by
env):
  - load1_before > LOADGATE_MAX_LOAD1 (default 2.0): the minute BEFORE
    the run already carried external load (r16's one-shot ran at 8.9);
  - steal_delta_sec > LOADGATE_MAX_STEAL_FRAC (default 0.02) x window
    estimate: the hypervisor took >2% of the window from the guest
    (r16: steal inflated tcpu 7x on identical work);
  - any per-query load1 sample > ncpu x LOADGATE_MAX_LOAD_RATIO
    (default 1.5): mid-run external burst (our own local[32] work
    cannot push 1-min load past ~ncpu by itself for long).

Exit code: number of CONTENDED artifacts (0 = all clean).
"""
import json
import os
import sys

MAX_LOAD1 = float(os.environ.get("LOADGATE_MAX_LOAD1", "2.0"))
MAX_STEAL_FRAC = float(os.environ.get("LOADGATE_MAX_STEAL_FRAC", "0.02"))
MAX_LOAD_RATIO = float(os.environ.get("LOADGATE_MAX_LOAD_RATIO", "1.5"))

def gate(path):
    with open(path) as f:
        # artifacts are one JSON object per line; gate the first line
        art = json.loads(f.readline())
    host = art.get("host")
    if host is None:
        return ("NO-HOST-BLOCK", ["artifact predates load gating; "
                                  "re-run to produce a gateable artifact"])
    reasons = []
    lb = host.get("load1_before", -1)
    if lb > MAX_LOAD1:
        reasons.append(f"load1_before={lb} > {MAX_LOAD1} "
                       "(external load before the run started)")
    ncpu = host.get("ncpu", 0) or 1
    # window estimate: bench carries total seconds in `value`, soak in
    # pass1+pass2
    window = art.get("value") or (
        art.get("pass1_sec", 0) + art.get("pass2_sec", 0)) or 0
    steal = host.get("steal_delta_sec", -1)
    if steal >= 0 and window > 0 and steal > MAX_STEAL_FRAC * window:
        reasons.append(f"steal_delta_sec={steal} > "
                       f"{MAX_STEAL_FRAC} x {window:.0f}s window "
                       "(hypervisor steal)")
    attrib = art.get("attrib", {})
    hot = {k: v.get("load1", -1) for k, v in attrib.items()
           if isinstance(v, dict) and v.get("load1", -1) > ncpu * MAX_LOAD_RATIO}
    if hot:
        worst = sorted(hot.items(), key=lambda kv: -kv[1])[:5]
        reasons.append(
            f"{len(hot)} queries saw load1 > {ncpu}x{MAX_LOAD_RATIO} "
            f"mid-run (worst: {worst})")
    return (("CONTENDED", reasons) if reasons else ("CLEAN", []))

def main():
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    n_bad = 0
    for p in paths:
        try:
            verdict, reasons = gate(p)
        except Exception as ex:
            verdict, reasons = "ERROR", [str(ex)]
        if verdict not in ("CLEAN",):
            n_bad += verdict == "CONTENDED"
        print(f"{verdict:10s} {p}")
        for r in reasons:
            print(f"           - {r}")
    return n_bad

if __name__ == "__main__":
    sys.exit(main())
