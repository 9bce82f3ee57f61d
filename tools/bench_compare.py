#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts per query.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Accepts either a raw bench line, a driver BENCH_r*.json wrapper (uses its
"parsed" field when present, else greps the "tail" for the metric line), or
a log file containing the metric line. Prints per-query old/new/ratio sorted
by regression severity and flags ratios beyond the threshold. Queries that
appear on only one side are listed separately (added/removed). Exits 1 if
any shared query regressed beyond the threshold — mind the VM-stall caveat
in README (timings are min-of-reps, but a stall can still leak through).
"""
import json, re, sys


def load(path):
    text = open(path).read()
    try:
        j = json.loads(text)
        if isinstance(j, dict) and "queries" in j:
            return j
        if isinstance(j, dict) and j.get("parsed"):
            return j["parsed"]
        text = json.dumps(j.get("tail", "")) if isinstance(j, dict) else text
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))
    sys.exit(f"no bench metric line found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq), key=lambda k: -(nq[k] / max(oq[k], 1e-9)))
    regressions = 0
    print(f"{'query':30s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}")
    for k in shared:
        r = nq[k] / max(oq[k], 1e-9)
        flag = " <-- REGRESSED" if r > thr else (" (improved)" if r < 1 / thr else "")
        regressions += r > thr
        print(f"{k:30s} {oq[k]:8.2f} {nq[k]:8.2f} {r:7.2f}{flag}")
    for k in sorted(set(nq) - set(oq)):
        print(f"{k:30s} {'-':>8s} {nq[k]:8.2f}   added")
    for k in sorted(set(oq) - set(nq)):
        print(f"{k:30s} {oq[k]:8.2f} {'-':>8s}   removed")
    ot = sum(oq[k] for k in shared)
    nt = sum(nq[k] for k in shared)
    print(f"\nshared-query total: {ot:.1f}s -> {nt:.1f}s "
          f"(x{nt / max(ot, 1e-9):.2f}); failed old={old.get('failed', [])} "
          f"new={new.get('failed', [])}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
