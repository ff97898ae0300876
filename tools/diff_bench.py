#!/usr/bin/env python3
"""One-command bench drift triage between two per-query snapshots.

Compares the MIN times (the noise floor — see SOAK.md's bench-noise
methodology; medians carry interleaved-neighbor and host-load noise) of
two BENCH_QUERIES_r{N}.json / target/bench_queries.json files and flags:

  - REGRESSION: new min exceeds max(old*ratio, old+abs) — the same
    threshold the round-close audits use (default 1.5x / +0.3 s);
  - IMPROVED:  new min under old*0.7 and at least 0.3 s faster;
  - ADDED / REMOVED queries.

A flagged regression is a CANDIDATE, not a verdict: re-measure it in a
fresh JVM (`sbt 'Test/runMain graft.DevScratch <q> <sfdir> 4 noExplain'`)
before treating it as real — registry-order neighbor effects routinely
inflate a single query (the q85/q131 case in SOAK.md round 11).

Usage: tools/diff_bench.py OLD.json NEW.json [ratio] [abs_s]
Exit code 1 iff any regression candidate is flagged.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    om = old.get("queries_min") or old.get("queries") or {}
    nm = new.get("queries_min") or new.get("queries") or {}
    print(f"old: {old.get('value')} s over {len(om)} | "
          f"new: {new.get('value')} s over {len(nm)}")
    regs = []
    for q, v in sorted(nm.items()):
        o = om.get(q)
        if o is None or v is None:
            continue
        if v > max(o * ratio, o + abs_s):
            regs.append((q, o, v))
        elif v < o * 0.7 and o - v > abs_s:
            print(f"  IMPROVED   {q}: {o:.2f} -> {v:.2f} ({v/o:.2f}x)")
    for q in sorted(set(nm) - set(om)):
        print(f"  ADDED      {q}: {nm[q]:.2f}")
    for q in sorted(set(om) - set(nm)):
        print(f"  REMOVED    {q} (was {om[q]:.2f})")
    for q, o, v in sorted(regs, key=lambda x: -(x[2] / x[1])):
        print(f"  REGRESSION {q}: {o:.2f} -> {v:.2f} ({v/o:.2f}x) — "
              "re-measure fresh-JVM before believing it")
    if not regs:
        print("zero min-regressions")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
